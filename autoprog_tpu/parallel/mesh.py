"""Device mesh and sharding utilities.

TPU-native replacement for the reference's distributed runtime layer
(SURVEY §2.3/§5.8): where the reference launches one torch process per GPU
and wraps the model in NCCL DDP (`main_prog.py:347-361,538-549`), here a
single SPMD program runs over a `jax.sharding.Mesh`:

  * the batch axis is sharded over the `data` mesh axis — XLA emits the
    gradient all-reduce (psum over ICI) from the sharded loss, replacing
    DDP bucketing/overlap;
  * params/optimizer state are replicated over `data` (pure DP, matching
    the reference's only parallelism strategy, SURVEY §2.4); an optional
    `model` axis shards the wide MLP/attention weights of the larger VOLO
    variants (tensor parallelism the reference does not have);
  * metric reduction (`reduce_tensor`, `main_prog.py:1043`) is just a mean
    over the already-global loss value — no explicit collective needed.

Multi-host extends the same program over DCN via
`jax.distributed.initialize` (call `maybe_init_distributed` once).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallel: int = 1) -> Mesh:
    """1-D data mesh, optionally folding a model-parallel minor axis.

    With model_parallel > 1 the mesh is (data, model) with `model` laid out
    over adjacent devices so tensor-parallel collectives ride the shortest
    ICI hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    _warm_collectives(mesh)
    return mesh


_WARMED = False


def _warm_collectives(mesh: Mesh) -> None:
    """Multi-process only: initialize the cross-process collective
    context ONCE, at a point where all processes are synchronized.

    XLA:CPU's Gloo backend creates its communicator context lazily at
    the first cross-process execution, with a hard ~30 s key-value
    rendezvous window. ANY first execution on the global clique — even
    an eager elementwise op on a replicated array — can be that trigger,
    so a process running >30 s ahead (compile skew, host load) deadlocks
    the others. One barrier + dummy psum here pays the rendezvous while
    processes are provably aligned; every later dispatch reuses the
    context."""
    global _WARMED
    if _WARMED or jax.process_count() <= 1:
        return
    _WARMED = True
    compile_barrier("mesh_collective_warmup")
    import jax.numpy as jnp
    if int(mesh.shape[DATA_AXIS]) % jax.process_count() != 0:
        # data axis smaller than (or ragged over) the process count (e.g.
        # large model_parallel): per-process local shards would not tile
        # the data axis — warm over a replicated array instead, which
        # pays the same Gloo context rendezvous
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.ones((4,), np.float32), (4,))
        out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
        float(out)
        return
    rows = int(mesh.shape[DATA_AXIS]) // jax.process_count()
    local = np.ones((rows,), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), local)
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    float(out)  # block until the context exists everywhere


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the leading axis sharded over
    `data` (the per-host loader feeds its local shard; see data/loader.py).

    Multi-process: built from each process's LOCAL shard via
    `make_array_from_process_local_data` — a plain `device_put` to a
    multi-process sharding inserts a per-leaf `assert_equal` allgather
    (jax dispatch.py:482-497), i.e. hundreds of host collectives per
    step whose 30 s Gloo setup windows deadlock the trainer whenever the
    processes skew (e.g. one is still compiling). The local-data path
    needs no collective at all, and is the only semantically right one
    anyway: each host's loader yields a DIFFERENT shard."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def replicate(mesh: Mesh, tree):
    """Fully-replicated global arrays from per-process host copies.

    Multi-process: same collective-free construction as `shard_batch`
    (every process holds the full value, so its local data IS its
    portion of the replicated array). The cross-process agreement this
    skips is guaranteed upstream: params come from the same seed or the
    same checkpoint, and grow decisions are broadcast (sync_decision)."""
    s = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), tree)

    def put(x):
        return jax.make_array_from_process_local_data(
            s, np.asarray(x), np.shape(x))
    return jax.tree.map(put, tree)


_BARRIER_SEQ: dict = {}


def compile_barrier(tag: str, timeout_ms: int = 1_800_000) -> None:
    """Rendezvous all processes through the coordination service (plain
    gRPC barrier — long timeout, no Gloo).

    XLA:CPU's Gloo collectives initialize their context lazily at a
    program's FIRST dispatch with a hard ~30 s key-value timeout; two
    processes compiling the same (minutes-long) program at different
    speeds therefore deadlock the faster one. Calling this after
    AOT-compiling and before first dispatch absorbs any compile skew.
    No-op single-process."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed
        client = getattr(distributed.global_state, "client", None)
        if client is None:
            return
        n = _BARRIER_SEQ.get(tag, 0)
        _BARRIER_SEQ[tag] = n + 1
        client.wait_at_barrier(f"autoprog:{tag}:{n}", timeout_ms)
    except Exception:
        pass  # barrier is a scheduling aid, never a failure mode


def maybe_init_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched under a cluster
    env (no-op single-host). DCN analogue of
    `torch.distributed.init_process_group` (`main_prog.py:355`)."""
    import os
    if "COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()
    if jax.process_count() > 1:
        # re-point the compile cache at this process's own dir (the
        # process count was not known when apply_platform_env first set
        # it — see platform.enable_compilation_cache)
        from autoprog_tpu.platform import enable_compilation_cache
        enable_compilation_cache()


def process_batch_slice(global_batch: int) -> slice:
    """This host's slice of the global batch (DistributedSampler analogue)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
