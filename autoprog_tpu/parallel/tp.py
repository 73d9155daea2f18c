"""Tensor-parallel param sharding over the mesh's `model` axis.

Capability beyond the reference (which is data-parallel only, SURVEY
§2.4): Megatron-style sharding of the transformer blocks for the wide
VOLO variants (D4/D5: 768-dim, 16 heads) —

  * qkv / kv / q / mlp.fc1 kernels: output dim sharded (column parallel);
  * attn proj / mlp.fc2 kernels: input dim sharded (row parallel);
  * biases follow their kernel's output sharding;
  * embeddings, norms, stem convs, heads: replicated.

No collectives are written by hand: annotating the param shardings and
keeping the batch sharded over `data` lets XLA GSPMD insert the
all-reduce pair per block over ICI. The attention head reshape stays
shardable because head counts are multiples of the model-axis size
(asserted).
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autoprog_tpu.parallel.mesh import MODEL_AXIS

_COL_PARALLEL = ("qkv", "kv", "q", "fc1", "v", "attn")  # shard out features
_ROW_PARALLEL = ("proj", "fc2")                         # shard in features


def param_spec(path: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one param leaf, keyed by its module path."""
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    in_block = any(n.startswith("s") and "b" in n for n in names) or \
        any(n.startswith("post") for n in names)
    if not in_block:
        return P()
    if leaf == "kernel" and ndim == 2:
        if parent in _COL_PARALLEL:
            return P(None, MODEL_AXIS)
        if parent in _ROW_PARALLEL:
            return P(MODEL_AXIS, None)
    if leaf == "bias" and parent in _COL_PARALLEL:
        return P(MODEL_AXIS)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """device_put every param leaf with its TP sharding."""
    def place(path, leaf):
        spec = param_spec(path, leaf.ndim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_state_tp(mesh: Mesh, state):
    """Apply TP shardings to params, optimizer moments and EMA trees
    (they all mirror the param tree structure)."""
    params = shard_params_tp(mesh, state.params)

    def shard_like_params(tree):
        # optax states embed param-shaped leaves; shard any leaf whose
        # path suffix matches a param path by reusing param_spec
        def place(path, leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1:
                spec = param_spec(path, leaf.ndim)
            else:
                spec = P()
            try:
                return jax.device_put(leaf, NamedSharding(mesh, spec))
            except Exception:
                return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.tree_util.tree_map_with_path(place, tree)

    return state.replace(
        params=params,
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            state.batch_stats),
        opt_state=shard_like_params(state.opt_state),
        ema_params=tuple(shard_like_params(e) for e in state.ema_params))


def validate_tp(mesh: Mesh, num_heads: Tuple[int, ...]) -> None:
    mp = mesh.shape[MODEL_AXIS]
    if mp == 1:
        return
    bad = [h for h in num_heads if h % mp]
    if bad:
        raise ValueError(
            f"model-parallel size {mp} must divide every head count; "
            f"got {num_heads}")
