"""Growth / shrink weight remapping as pure pytree -> pytree functions.

The heart of progressive model growth (reference `prog/helpers.py:121-902`).
Where the reference walks `named_modules` and mutates torch tensors
in-place, here remapping is a pure function from the small model's param
tree (+ optional EMA trees) to the big model's param tree, built against a
shape template of the destination (from `jax.eval_shape` of init) — no
modules, no mutation, jit-friendly.

Modes (reference function in parentheses):
  * "slice"       top-left block copy into fresh init, same-name layers
                  only — NO depth interpolation; layers beyond the source
                  depth keep their fresh init (load_slice :121;
                  self-documented as broken for fused qkv — kept for
                  parity, not the default);
  * "clone_rand"  depth interpolation + top-left slice copy; new width
                  channels keep the fresh random init
                  (load_slice_clone_rand :183);
  * "zero"        top-left copy into zeros (load_slice_clone_zero :265);
  * "clone"       width growth by channel tiling with 1/scale input
                  compensation and per-projection qkv/kv tiling
                  (load_slice_clone :349);
  * "clone_noise" same + truncated-normal(std .01) noise on cloned
                  replicas — the paper's symmetry breaking
                  (load_slice_clone_noise :481);
  * "clone_ema"   new channels stitched from >=3 extra EMA trees
                  (load_slice_clone_ema :613).

Depth growth maps every new layer to its interpolation source
(`new_idx`, prog/depth.py); `shrink_params` implements the supernet ->
standalone selection of `load_super` (:752).

Layout note: flax Dense kernels are [in, out] (torch Linear weight is
[out, in]); conv kernels are HWIO. The tiling/rescale rules below are the
transposed equivalents of the reference's, with the same math:
growing input width multiplies duplicated inputs into the layer, so the
kernel is divided by scale = new_in/old_in to preserve the function
(`prog/helpers.py:431-449`).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from autoprog_tpu.prog.depth import depth_source_index, super_select_indices

_BLOCK_RE = re.compile(r"s(\d+)b(\d+)")


def _trunc_normal(key, shape, std=0.01, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _tile_axis(arr: jax.Array, axis: int, target: int,
               noise_key: Optional[jax.Array]) -> jax.Array:
    """Tile `arr` along `axis` up to `target`, optionally adding fresh
    trunc-normal noise to every replica after the first."""
    size = arr.shape[axis]
    if size >= target:
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, target)
        return arr[tuple(idx)]
    reps = -(-target // size)
    parts = [arr]
    for k in range(reps - 1):
        if noise_key is not None:
            nk = jax.random.fold_in(noise_key, axis * 131 + k)
            parts.append(arr + _trunc_normal(nk, arr.shape, dtype=arr.dtype))
        else:
            parts.append(arr)
    out = jnp.concatenate(parts, axis=axis)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(0, target)
    return out[tuple(idx)]


def _stitch_axis(base: jax.Array, extra: jax.Array, axis: int,
                 target: int) -> jax.Array:
    """[base | extra] along `axis`, cropped to target (EMA stitching; the
    reference asserts growth <= 2x here, `prog/helpers.py:643,696`)."""
    if target > base.shape[axis] + extra.shape[axis]:
        raise ValueError("clone_ema supports at most 2x width growth")
    out = jnp.concatenate([base, extra], axis=axis)
    idx = [slice(None)] * base.ndim
    idx[axis] = slice(0, target)
    return out[tuple(idx)]


def _is_fused_proj(path: Tuple[str, ...]) -> int:
    """3 for qkv, 2 for kv, 0 otherwise."""
    if "qkv" in path:
        return 3
    if "kv" in path:
        return 2
    return 0


def _grow_dense_kernel(src, dst_shape, fuse: int, mode: str, noise_key,
                       ema: Optional[Sequence[jax.Array]]):
    s_in, s_out = src.shape
    d_in, d_out = dst_shape
    scale = d_in / s_in
    nk = noise_key if mode == "clone_noise" else None
    if fuse:
        srcf = src.reshape(s_in, fuse, s_out // fuse)
        if mode == "clone_ema":
            r1 = _stitch_axis(srcf, ema[0].reshape(s_in, fuse, -1), 0, d_in)
            r2 = _stitch_axis(ema[1].reshape(s_in, fuse, -1),
                              ema[2].reshape(s_in, fuse, -1), 0, d_in)
            out = _stitch_axis(r1, r2, 2, d_out // fuse)
        else:
            out = _tile_axis(srcf, 0, d_in, nk)
            out = _tile_axis(out, 2, d_out // fuse, nk)
        return (out / scale).reshape(d_in, d_out)
    if mode == "clone_ema":
        r1 = _stitch_axis(src, ema[0], 0, d_in)
        r2 = _stitch_axis(ema[1], ema[2], 0, d_in)
        out = _stitch_axis(r1, r2, 1, d_out)
    else:
        out = _tile_axis(src, 0, d_in, nk)
        out = _tile_axis(out, 1, d_out, nk)
    return out / scale


def _grow_dense_bias(src, dst_shape, fuse: int, mode: str,
                     ema: Optional[Sequence[jax.Array]]):
    (d_out,) = dst_shape
    if fuse:
        srcf = src.reshape(fuse, -1)
        if mode == "clone_ema":
            out = _stitch_axis(srcf, ema[0].reshape(fuse, -1), 1, d_out // fuse)
        else:
            out = _tile_axis(srcf, 1, d_out // fuse, None)
        return out.reshape(d_out)
    if mode == "clone_ema":
        return _stitch_axis(src, ema[0], 0, d_out)
    return _tile_axis(src, 0, d_out, None)


def _grow_conv_kernel(src, dst_shape, is_downsample: bool, mode: str,
                      noise_key, ema: Optional[Sequence[jax.Array]]):
    # HWIO layout; the reference rescales only the inter-stage downsample
    # conv (torch 'network.1', `prog/helpers.py:380-384`)
    d_in, d_out = dst_shape[2], dst_shape[3]
    nk = noise_key if mode == "clone_noise" else None
    if mode == "clone_ema":
        r1 = _stitch_axis(src, ema[0], 2, d_in)
        r2 = _stitch_axis(ema[1], ema[2], 2, d_in)
        out = _stitch_axis(r1, r2, 3, d_out)
    else:
        out = _tile_axis(src, 2, d_in, nk)
        out = _tile_axis(out, 3, d_out, nk)
    if is_downsample:
        out = out / (d_in / src.shape[2])
    return out


def _grow_vector(src, dst_shape, mode: str,
                 ema: Optional[Sequence[jax.Array]]):
    """1-D affine params (LayerNorm/BN scale+bias, conv bias)."""
    (d,) = dst_shape
    if mode == "clone_ema":
        return _stitch_axis(src, ema[0], 0, d)
    return _tile_axis(src, 0, d, None)


def _grow_embed(src, dst_shape, mode: str, ema: Optional[Sequence[jax.Array]]):
    """pos_embed / cls_token / dist_token: tile the channel (last) axis
    (`prog/helpers.py:464-473`)."""
    d_c = dst_shape[-1]
    if src.shape[:-1] != tuple(dst_shape[:-1]):
        raise ValueError(
            f"embed grid mismatch {src.shape} -> {dst_shape}; growth does "
            "not resize pos-embed grids (resolution is handled at runtime)")
    if mode == "clone_ema":
        return _stitch_axis(src, ema[0], src.ndim - 1, d_c)
    return _tile_axis(src, src.ndim - 1, d_c, None)


def _depth_mapped_path(path: Tuple[str, ...], src_layers: Sequence[int],
                       dst_layers: Sequence[int]) -> Tuple[str, ...]:
    m = _BLOCK_RE.fullmatch(path[0])
    if not m:
        return path
    stage, idx = int(m.group(1)), int(m.group(2))
    src_idx = depth_source_index(idx, src_layers[stage], dst_layers[stage])
    return (f"s{stage}b{src_idx}",) + path[1:]


def _remap_tree(src_flat: Dict, dst_template, *, path_map, mode: str,
                ema_flats: Optional[Sequence[Dict]], rng,
                keep_template_when_missing: bool):
    dst_flat = flatten_dict(dst_template)
    out = {}
    for path, tmpl in dst_flat.items():
        sp = path_map(path)
        if sp not in src_flat:
            if not keep_template_when_missing:
                raise KeyError(f"no source for {path} (mapped {sp})")
            out[path] = tmpl
            continue
        src = src_flat[sp]
        dst_shape = tuple(tmpl.shape)
        if tuple(src.shape) == dst_shape and mode not in ("clone_noise",):
            # materialize a copy: depth cloning maps several destination
            # layers to one source, and aliased buffers break step donation
            out[path] = jnp.array(src, dtype=tmpl.dtype, copy=True)
            continue
        ema = [e[sp] for e in ema_flats] if ema_flats else None
        leaf_key = None
        if rng is not None:
            import zlib
            stable = zlib.crc32("/".join(sp).encode()) & 0x7FFFFFFF
            leaf_key = jax.random.fold_in(rng, stable)
        name = path[-1]
        if mode in ("slice", "clone_rand", "zero"):
            base = jnp.zeros(dst_shape, tmpl.dtype) if mode == "zero" \
                else tmpl
            sl = tuple(slice(0, s) for s in src.shape)
            out[path] = base.at[sl].set(src.astype(tmpl.dtype))
            continue
        if name == "kernel" and src.ndim == 2:
            grown = _grow_dense_kernel(src, dst_shape, _is_fused_proj(path),
                                       mode, leaf_key, ema)
        elif name == "bias" and src.ndim == 1 and any(
                p in ("qkv", "kv", "q", "proj", "fc1", "fc2", "head",
                      "aux_head", "head_dist", "attn", "v") for p in path):
            grown = _grow_dense_bias(src, dst_shape, _is_fused_proj(path),
                                     mode, ema)
        elif name == "kernel" and src.ndim == 4:
            is_ds = any(p.startswith("ds") for p in path)
            grown = _grow_conv_kernel(src, dst_shape, is_ds, mode, leaf_key,
                                      ema)
        elif name in ("pos_embed", "cls_token", "dist_token"):
            grown = _grow_embed(src, dst_shape, mode, ema)
        elif src.ndim == 1:
            grown = _grow_vector(src, dst_shape, mode, ema)
        else:
            raise NotImplementedError(f"no growth rule for {path} "
                                      f"{src.shape} -> {dst_shape}")
        out[path] = grown.astype(tmpl.dtype)
    return unflatten_dict(_dedupe_buffers(out))


def _dedupe_buffers(flat: Dict) -> Dict:
    """Force distinct device buffers for every leaf. Depth cloning maps
    several destination layers to one source (`x.astype(x.dtype)` returns
    the SAME array object), which breaks the train step's donation
    (`donate(a), donate(a)` -> INVALID_ARGUMENT on TPU; CPU ignores
    donation, so the failure is chip-only).

    Aliases are keyed on the Python object identity FIRST:
    `unsafe_buffer_pointer()` is UNIMPLEMENTED on tunneled PJRT backends
    (axon raises), and a dedupe that silently no-ops there was exactly the
    round-4/5 on-chip `30_search_sync` crash — the first donated step
    after a depth-clone growth poisoned the stream. Every alias growth
    produces is a same-object alias (eager jnp ops always allocate fresh
    buffers), so id() needs no pointer API; the pointer check remains as a
    second net for backends that support it. Duplicates are broken with a
    DEVICE-side copy — the old host round-trip costs two tunnel transfers
    per duplicated leaf."""
    def ptr_of(leaf):
        try:
            return leaf.unsafe_buffer_pointer()
        except Exception:
            pass
        try:  # sharded array: identify by the first addressable shard
            return leaf.addressable_shards[0].data.unsafe_buffer_pointer()
        except Exception:
            return None

    seen_ids = set()
    seen_ptrs = set()
    out = {}
    for path, leaf in flat.items():
        ptr = ptr_of(leaf)
        if id(leaf) in seen_ids or (ptr is not None and ptr in seen_ptrs):
            out[path] = jnp.array(leaf, copy=True)
        else:
            seen_ids.add(id(leaf))
            if ptr is not None:
                seen_ptrs.add(ptr)
            out[path] = leaf
    return out


def grow_params(src_params, dst_template, *, src_layers: Sequence[int],
                dst_layers: Sequence[int], mode: str = "clone",
                ema_trees: Optional[Sequence] = None,
                rng: Optional[jax.Array] = None):
    """Remap a smaller model's params into a larger template.

    Args:
      src_params: param tree of the previous-stage model.
      dst_template: param tree (arrays or ShapeDtypeStructs materialized to
        arrays) of the new model — provides target shapes and, for
        mode='slice', the fresh init values.
      src_layers/dst_layers: per-stage block counts of the two archs.
      mode: see module docstring.
      ema_trees: >=3 EMA param trees for mode='clone_ema'
        (the reference requires len(ema)>3 where ema[3] is the *source*;
        pass source=ema[3] as src_params and ema[:3] here).
      rng: PRNGKey for mode='clone_noise'.
    """
    if mode == "clone_ema" and (ema_trees is None or len(ema_trees) < 3):
        raise ValueError("clone_ema needs >= 3 extra EMA trees "
                         "(`prog/helpers.py:616`)")
    if mode == "clone_noise" and rng is None:
        raise ValueError("clone_noise needs an rng key")
    src_flat = flatten_dict(src_params)
    ema_flats = [flatten_dict(t) for t in ema_trees] if ema_trees else None

    if mode == "slice":
        # load_slice matches modules by NAME only — new depth layers have
        # no source and keep their fresh init (`prog/helpers.py:127`,
        # contrast the `new_idx` remap in clone_rand :192-197)
        def path_map(p):
            return p
    else:
        def path_map(p):
            return _depth_mapped_path(p, src_layers, dst_layers)

    return _remap_tree(src_flat, dst_template, path_map=path_map, mode=mode,
                       ema_flats=ema_flats, rng=rng,
                       keep_template_when_missing=(mode == "slice"))


def shrink_params(super_params, dst_template, *, base_layers: Sequence[int],
                  super_layers: Sequence[int], dst_layers: Sequence[int],
                  base_l: int, super_l: int, dst_l: int,
                  family: str = "volo"):
    """Select a standalone sub-model's params out of a supernet
    (`load_super`, `prog/helpers.py:752-785`): per stage, keep the
    non-skip layer indices derived from the (base -> super) growth."""
    sel = super_select_indices(base_l, super_l, dst_l, family)
    src_flat = flatten_dict(super_params)

    def path_map(path):
        m = _BLOCK_RE.fullmatch(path[0])
        if not m:
            return path
        stage, idx = int(m.group(1)), int(m.group(2))
        if stage < len(sel) and len(dst_layers) > stage and \
                dst_layers[stage] < super_layers[stage]:
            src_idx = sel[stage][idx]
        else:
            src_idx = depth_source_index(idx, super_layers[stage],
                                         dst_layers[stage])
        return (f"s{stage}b{src_idx}",) + path[1:]

    return _remap_tree(src_flat, dst_template, path_map=path_map,
                       mode="clone", ema_flats=None, rng=None,
                       keep_template_when_missing=False)


def grow_batch_stats(src_stats, dst_template, *, src_layers, dst_layers):
    """Carry BN running stats through growth when shapes match (the VOLO
    stem never changes width across variants). The reference drops running
    stats on growth (`prog/helpers.py:398-401` commented out) and
    re-estimates them; copying is strictly better and `recalibrate_bn`
    remains available (train/bn.py)."""
    if not src_stats:
        return dst_template
    src_flat = flatten_dict(src_stats)
    dst_flat = flatten_dict(dst_template)
    out = {}
    for path, tmpl in dst_flat.items():
        sp = _depth_mapped_path(path, src_layers, dst_layers)
        src = src_flat.get(sp)
        if src is not None and tuple(src.shape) == tuple(tmpl.shape):
            out[path] = jnp.array(src, dtype=tmpl.dtype, copy=True)
        else:
            out[path] = jnp.array(tmpl, copy=True)
    return unflatten_dict(_dedupe_buffers(out))
