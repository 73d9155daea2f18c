"""Sliding-window patch extraction (unfold) and its adjoint (fold), NHWC.

These are the data-movement primitives of outlook attention
(reference `models/volo.py:74-98` uses `nn.Unfold` / `F.fold`, which on GPU
dispatch to cuDNN im2col kernels). Here:

  * `unfold_nhwc` is k*k static strided slices of the padded input —
    XLA lowers each to a cheap strided window copy and fuses the stack.
  * `fold_nhwc` is derived as the exact linear transpose of `unfold_nhwc`
    via `jax.linear_transpose`, so fold/unfold are adjoint by construction
    (the property `F.fold(F.unfold(x)) == overlap_count * x` holds).

Both are shape-static and differentiable; the fused Pallas outlook kernel
(ops/outlook_pallas.py) bypasses them entirely by never materializing the
unfolded tensor in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def unfold_nhwc(x: jax.Array, kernel_size: int, stride: int,
                padding: int) -> jax.Array:
    """Extract k x k patches: [B,H,W,C] -> [B,h,w,k,k,C] where
    h = floor((H + 2p - k)/s) + 1 (torch Unfold windowing)."""
    B, H, W, C = x.shape
    k, s, p = kernel_size, stride, padding
    h = (H + 2 * p - k) // s + 1
    w = (W + 2 * p - k) // s + 1
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    rows = []
    for ki in range(k):
        cols = []
        for kj in range(k):
            # strided slice selecting window offset (ki, kj) for every patch
            sl = jax.lax.slice(
                xp,
                (0, ki, kj, 0),
                (B, ki + s * (h - 1) + 1, kj + s * (w - 1) + 1, C),
                (1, s, s, 1),
            )
            cols.append(sl)
        rows.append(jnp.stack(cols, axis=3))  # [B,h,w,k,C]
    return jnp.stack(rows, axis=3)  # [B,h,w,k,k,C]


def fold_nhwc(patches: jax.Array, output_size: tuple, kernel_size: int,
              stride: int, padding: int) -> jax.Array:
    """Adjoint of `unfold_nhwc`: scatter-add overlapping patches back to
    an [B,H,W,C] canvas (torch `F.fold` semantics)."""
    H, W = output_size
    B = patches.shape[0]
    C = patches.shape[-1]
    f = partial(unfold_nhwc, kernel_size=kernel_size, stride=stride,
                padding=padding)
    transpose = jax.linear_transpose(
        f, jax.ShapeDtypeStruct((B, H, W, C), patches.dtype))
    return transpose(patches)[0]


def avg_pool_ceil(x: jax.Array, stride: int) -> jax.Array:
    """AvgPool2d(kernel=stride, stride=stride, ceil_mode=True) over NHWC.

    Matches the attention-map pooling in outlook attention
    (`models/volo.py:75,87`). Inputs here always have H, W divisible by the
    stride (resolutions are multiples of 32), so the ceil only pads shape
    math, never data.
    """
    if stride == 1:
        return x
    B, H, W, C = x.shape
    if H % stride == 0 and W % stride == 0:
        h, w = H // stride, W // stride
        return x.reshape(B, h, stride, w, stride, C).mean(axis=(2, 4))
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, stride, stride, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, (stride - H % stride) % stride),
                 (0, (stride - W % stride) % stride), (0, 0)),
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add,
        window_dimensions=(1, stride, stride, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, (stride - H % stride) % stride),
                 (0, (stride - W % stride) % stride), (0, 0)),
    )
    return out / counts
