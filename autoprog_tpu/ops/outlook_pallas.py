"""Fused Pallas TPU kernel for outlook attention.

Replaces the cuDNN im2col pipeline of the reference
(`models/volo.py:74-98`: Unfold -> softmax(attn) @ v -> Fold) with ONE
kernel that keeps the whole per-image working set in VMEM: the unfolded
value patches and the attended patches (the two large intermediates the
XLA path round-trips through HBM) never leave the chip's vector memory.

Shapes (VOLO @224, stage 0): v [B,28,28,192], attn [B,14,14,6*81] —
~4 MB/program working set, well inside VMEM. The grid is (B,): one
program per image.

Kernel structure (stride 2, kernel 3, padding 1 — the only VOLO config):
  * unfold  = parity reshapes of the padded map (no strided slices);
  * fold    = the scatter-free parity composition: output rows/cols split
    by parity receive contributions from at most 2 window offsets per
    axis, so fold is pad + add + interleave (stack/reshape) — MXU/VPU
    friendly, no scatter;
  * softmax in f32; the attend step is a batched 9x9 @ 9xd einsum.

`outlook_attention_fused` wraps the kernel in a custom_vjp whose backward
is the XLA composition of the same adjoint pieces (fold/unfold swap roles),
so the op is trainable. Numerics are bit-checked against the XLA reference
path (`ops/outlook.py`) in tests/test_outlook_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autoprog_tpu.ops.unfold import fold_nhwc, unfold_nhwc


def _interleave(a: jax.Array, b: jax.Array, axis: int) -> jax.Array:
    """[n, ...],[n, ...] -> [2n, ...] alternating a0,b0,a1,b1,..."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _row_slabs(padded: jax.Array, h: int):
    """padded [2h+2, W2, C] -> the three stride-2 row slabs [h, W2, C]
    for window offsets ki = 0, 1, 2."""
    W2, C = padded.shape[1], padded.shape[2]
    pairs = padded.reshape(h + 1, 2, W2, C)
    even, odd = pairs[:, 0], pairs[:, 1]
    return even[:h], odd[:h], even[1:]


def _col_slabs(rows: jax.Array, w: int):
    """rows [h, 2w+2, C] -> three stride-2 column slabs [h, w, C]."""
    hh, C = rows.shape[0], rows.shape[2]
    pairs = rows.reshape(hh, w + 1, 2, C)
    even, odd = pairs[:, :, 0], pairs[:, :, 1]
    return even[:, :w], odd[:, :w], even[:, 1:]


def _fold_axis(s0: jax.Array, s1: jax.Array, s2: jax.Array, axis: int):
    """Parity composition along `axis`: even positions get s0[m] + s2[m-1]
    (zero-padded at the ends), odd positions get s1[m]."""
    n = s0.shape[axis]
    padc = [(0, 0)] * s0.ndim
    pad_lo = list(padc)
    pad_lo[axis] = (0, 1)
    pad_hi = list(padc)
    pad_hi[axis] = (1, 0)
    even = jnp.pad(s0, pad_lo) + jnp.pad(s2, pad_hi)   # [n+1, ...]
    pad_odd = list(padc)
    pad_odd[axis] = (0, 1)
    odd = jnp.pad(s1, pad_odd)                          # [n+1, ...]
    return _interleave(even, odd, axis)                 # [2n+2, ...]


def _kernel(v_ref, attn_ref, o_ref, *, scale: float, h: int, w: int,
            num_heads: int):
    """One image per program, all heads together. v_ref [1,H,W,C] with
    channels permuted HEAD-MINOR (c' = d_idx*heads + head) so a per-head
    attention scalar broadcasts across the full lane width via
    tile-semantics pltpu.repeat. attn_ref [1,n,9,9,heads] (pre-shaped
    outside; softmax over q in-kernel), o_ref [1,4,h+1,w+1,C] = fold
    parity planes."""
    H, W, C = v_ref.shape[1], v_ref.shape[2], v_ref.shape[3]
    d = C // num_heads
    out_dtype = o_ref.dtype
    # all internals in f32: Mosaic rejects some of the slab/fold reshapes
    # under bf16 (16,128) tiling, and f32 accumulation is wanted anyway
    v = v_ref[0].astype(jnp.float32)
    padded = jnp.pad(v, ((1, 1), (1, 1), (0, 0)))       # [H+2, W+2, C]

    r0, r1, r2 = _row_slabs(padded, h)
    slabs = []
    for r in (r0, r1, r2):
        slabs.extend(_col_slabs(r, w))                  # 9 x [h, w, C]
    patches = jnp.stack(slabs, axis=2)                  # [h, w, 9, C]
    patches = patches.reshape(h * w, 9, C)

    att = attn_ref[0]                                   # [n, 9, 9, heads]
    att = jax.nn.softmax(att.astype(jnp.float32) * scale, axis=2)

    # attend on the VPU with full 192-lane tiles: the per-head scalar is
    # tiled d times along lanes (head-minor channel order makes the tile
    # pattern h0 h1 ... h0 h1 ... line up with the channels)
    avs = []
    for pp in range(9):
        acc = pltpu.repeat(att[:, pp, 0], d, 1) * patches[:, 0]
        for q in range(1, 9):
            acc = acc + pltpu.repeat(att[:, pp, q], d, 1) * patches[:, q]
        avs.append(acc)
    av = jnp.stack(avs, axis=1)                         # [n, 9, C]
    av = av.reshape(h, w, 9, C)

    s = [av[:, :, i] for i in range(9)]                 # 9 x [h, w, C]

    # scatter-free fold, parity-decomposed: even output rows/cols receive
    # window offsets {0, 2}, odd ones offset {1}
    def padp(x, dm, dn):
        return jnp.pad(x, ((dm, 1 - dm), (dn, 1 - dn), (0, 0)))

    ee = (padp(s[0], 0, 0) + padp(s[2], 0, 1) + padp(s[6], 1, 0)
          + padp(s[8], 1, 1))                           # [h+1, w+1, C]
    eo = padp(s[1], 0, 0) + padp(s[7], 1, 0)
    oe = padp(s[3], 0, 0) + padp(s[5], 0, 1)
    oo = padp(s[4], 0, 0)

    # four parity planes through one 5-D output (slice writes only —
    # Mosaic cannot lower the insert-dim reshapes an in-kernel interleave
    # would need); XLA interleaves them outside on output-sized data
    o_ref[0, 0] = ee.astype(out_dtype)
    o_ref[0, 1] = eo.astype(out_dtype)
    o_ref[0, 2] = oe.astype(out_dtype)
    o_ref[0, 3] = oo.astype(out_dtype)


def _forward(v: jax.Array, attn_logits: jax.Array, *, num_heads: int,
             scale: float, interpret: bool = False) -> jax.Array:
    B, H, W, C = v.shape
    h, w = attn_logits.shape[1], attn_logits.shape[2]
    n = h * w
    d = C // num_heads
    assert H == 2 * h and W == 2 * w, "fused kernel assumes stride 2"
    # pre-shape in XLA (free): channels head-minor, attention [B,n,9,9,hd]
    vp = v.reshape(B, H, W, num_heads, d).transpose(0, 1, 2, 4, 3)
    vp = vp.reshape(B, H, W, C)
    att = attn_logits.reshape(B, n, num_heads, 9, 9)
    att = att.transpose(0, 1, 3, 4, 2)                  # [B,n,9,9,heads]
    kern = functools.partial(_kernel, scale=scale, h=h, w=w,
                             num_heads=num_heads)
    planes = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 9, 9, num_heads), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, h + 1, w + 1, C),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, h + 1, w + 1, C), v.dtype),
        # XLA's memory-space assignment stages the plane output in vmem;
        # the default 16MB scoped limit rejects it at VOLO batch sizes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vp, att)
    ee, eo = planes[:, 0], planes[:, 1]
    oe, oo = planes[:, 2], planes[:, 3]
    # interleave the parity planes (XLA, output-sized data only)
    rows_e = _interleave(ee, eo, axis=2)        # [B,h+1,2w+2,C]
    rows_o = _interleave(oe, oo, axis=2)
    full = _interleave(rows_e, rows_o, axis=1)  # [B,2h+2,2w+2,C]
    out = full[:, 1:H + 1, 1:W + 1]
    # undo the head-minor channel permutation
    out = out.reshape(B, H, W, d, num_heads).transpose(0, 1, 2, 4, 3)
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def outlook_attention_fused(v, attn_logits, num_heads: int, scale: float,
                            interpret: bool = False):
    """Fused outlook attention (see module docstring).

    Args match `ops.outlook.outlook_attention` with kernel_size=3,
    stride=2, padding=1 fixed (the VOLO configuration).
    """
    return _forward(v, attn_logits, num_heads=num_heads, scale=scale,
                    interpret=interpret)


def _fwd(v, attn_logits, num_heads, scale, interpret):
    out = _forward(v, attn_logits, num_heads=num_heads, scale=scale,
                   interpret=interpret)
    return out, (v, attn_logits)


def _bwd(num_heads, scale, interpret, residuals, g):
    """XLA adjoint: fold/unfold swap roles; softmax recomputed."""
    v, attn_logits = residuals
    B, H, W, C = v.shape
    h, w = attn_logits.shape[1], attn_logits.shape[2]
    d = C // num_heads
    n = h * w

    patches = unfold_nhwc(v, 3, 2, 1).reshape(B, n, 9, num_heads, d)
    att = attn_logits.reshape(B, n, num_heads, 9, 9)
    att = jax.nn.softmax(att.astype(jnp.float32) * scale, axis=-1)

    dav = unfold_nhwc(g, 3, 2, 1).reshape(B, n, 9, num_heads, d)
    datt = jnp.einsum("bnphd,bnqhd->bnhpq", dav.astype(jnp.float32),
                      patches.astype(jnp.float32))
    ds = att * (datt - jnp.sum(datt * att, axis=-1, keepdims=True))
    dlogits = (ds * scale).astype(attn_logits.dtype)
    dlogits = dlogits.reshape(B, h, w, num_heads * 81)

    dpatches = jnp.einsum("bnhpq,bnphd->bnqhd", att,
                          dav.astype(jnp.float32)).astype(v.dtype)
    dv = fold_nhwc(dpatches.reshape(B, h, w, 3, 3, C), (H, W), 3, 2, 1)
    return dv, dlogits


outlook_attention_fused.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Hybrid variant: XLA unfold/fold (already near their bandwidth floor, see
# PERF.md) + a minimal Pallas kernel for ONLY the softmax+attend — no
# pads/slabs/interleaves for Mosaic to relayout.


def _attend_kernel(p_ref, a_ref, o_ref, *, scale: float, num_heads: int):
    """p_ref [1, n, 9, C] (head-minor channels), a_ref [1, n, 9, 9, heads],
    o_ref [1, 9, n, C] (p-major so each write is a plain leading-index
    store — a [n,C]-into-[1,n,1,C] slice write would need an insert-dim
    reshape Mosaic rejects)."""
    C = p_ref.shape[3]
    d = C // num_heads
    att = jax.nn.softmax(a_ref[0].astype(jnp.float32) * scale, axis=2)
    pf = p_ref[0].astype(jnp.float32)
    for pp in range(9):
        acc = pltpu.repeat(att[:, pp, 0], d, 1) * pf[:, 0]
        for q in range(1, 9):
            acc = acc + pltpu.repeat(att[:, pp, q], d, 1) * pf[:, q]
        o_ref[0, pp] = acc.astype(o_ref.dtype)


def _forward_hybrid(v, attn_logits, *, num_heads: int, scale: float,
                    interpret: bool = False):
    B, H, W, C = v.shape
    h, w = attn_logits.shape[1], attn_logits.shape[2]
    n = h * w
    d = C // num_heads
    patches = unfold_nhwc(v, 3, 2, 1).reshape(B, n, 9, C)
    # head-minor channel order so the per-head attention scalar broadcasts
    # across lanes via tile-semantics repeat
    pm = patches.reshape(B, n, 9, num_heads, d).transpose(0, 1, 2, 4, 3)
    pm = pm.reshape(B, n, 9, C)
    att = attn_logits.reshape(B, n, num_heads, 9, 9).transpose(0, 1, 3, 4, 2)
    kern = functools.partial(_attend_kernel, scale=scale,
                             num_heads=num_heads)
    av = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 9, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 9, 9, num_heads), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, n, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 9, n, C), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pm, att)
    av = av.transpose(0, 2, 1, 3)                      # [B, n, 9, C]
    av = av.reshape(B, n, 9, d, num_heads).transpose(0, 1, 2, 4, 3)
    av = av.reshape(B, h, w, 3, 3, C)
    return fold_nhwc(av, (H, W), 3, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def outlook_attention_hybrid(v, attn_logits, num_heads: int, scale: float,
                             interpret: bool = False):
    """XLA unfold/fold + Pallas attend (see module tail comment)."""
    return _forward_hybrid(v, attn_logits, num_heads=num_heads, scale=scale,
                           interpret=interpret)


def _fwd_h(v, attn_logits, num_heads, scale, interpret):
    out = _forward_hybrid(v, attn_logits, num_heads=num_heads, scale=scale,
                          interpret=interpret)
    return out, (v, attn_logits)


outlook_attention_hybrid.defvjp(_fwd_h, _bwd)


# --------------------------------------------------------------------------
# Hybrid v2: the round-1 hybrid isolated `pltpu.repeat` (expanding the
# per-head attention scalar across its head_dim lanes, 81 per program) as
# the kernel's bottleneck. Here the head->lane expansion is ONE MXU matmul
# per window offset against a constant one-hot matrix E[h, c] = [head(c)==h]
# — the systolic array does the broadcast, the VPU only runs full-width
# FMAs. Channels stay head-MAJOR (natural layout, no XLA-side permutes).
#
# Mosaic shape discipline: the per-offset attention slab [n, 9, heads] is
# sublane-padded 9 -> 16 so the (n, 16) -> n*16 row merge that feeds the
# 2-D matmul is tile-aligned for both f32 (8) and bf16 (16) layouts.


def _expansion_matrix(num_heads: int, C: int, dtype):
    d = C // num_heads
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_heads, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, C), 1)
    return (rows == cols // d).astype(dtype)


def _attend_kernel_v2(p_ref, a_ref, o_ref, *, scale: float, num_heads: int):
    """p_ref [1, n, 9, C] (natural head-major), a_ref [1, n, 9, 9, heads],
    o_ref [1, 9, n, C] (p-major writes, as in the v1 hybrid)."""
    n, C = p_ref.shape[1], p_ref.shape[3]
    att = jax.nn.softmax(a_ref[0].astype(jnp.float32) * scale, axis=2)
    E = _expansion_matrix(num_heads, C, jnp.float32)
    pf = p_ref[0].astype(jnp.float32)                   # [n, 9, C]
    for pp in range(9):
        a_p = jnp.pad(att[:, pp], ((0, 0), (0, 7), (0, 0)))  # [n, 16, h]
        aexp = jnp.dot(a_p.reshape(n * 16, num_heads), E,
                       preferred_element_type=jnp.float32)
        aexp = aexp.reshape(n, 16, C)[:, :9]            # [n, 9, C]
        o_ref[0, pp] = jnp.sum(aexp * pf, axis=1).astype(o_ref.dtype)


def _forward_hybrid2(v, attn_logits, *, num_heads: int, scale: float,
                     interpret: bool = False):
    B, H, W, C = v.shape
    h, w = attn_logits.shape[1], attn_logits.shape[2]
    n = h * w
    patches = unfold_nhwc(v, 3, 2, 1).reshape(B, n, 9, C)
    att = attn_logits.reshape(B, n, num_heads, 9, 9).transpose(0, 1, 3, 4, 2)
    kern = functools.partial(_attend_kernel_v2, scale=scale,
                             num_heads=num_heads)
    av = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, 9, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 9, 9, num_heads), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, n, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 9, n, C), v.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(patches, att)
    av = av.transpose(0, 2, 1, 3).reshape(B, h, w, 3, 3, C)
    return fold_nhwc(av, (H, W), 3, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def outlook_attention_hybrid2(v, attn_logits, num_heads: int, scale: float,
                              interpret: bool = False):
    """XLA unfold/fold + Pallas attend with MXU one-hot head expansion."""
    return _forward_hybrid2(v, attn_logits, num_heads=num_heads, scale=scale,
                            interpret=interpret)


def _fwd_h2(v, attn_logits, num_heads, scale, interpret):
    out = _forward_hybrid2(v, attn_logits, num_heads=num_heads, scale=scale,
                           interpret=interpret)
    return out, (v, attn_logits)


outlook_attention_hybrid2.defvjp(_fwd_h2, _bwd)
