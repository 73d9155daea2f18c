"""Outlook attention core (XLA reference path).

Computes the unfold -> softmax(attn) @ v -> fold pipeline of VOLO's outlook
attention (reference `models/volo.py:77-103`) as a pure function of the
already-projected value map and attention logits. The reference leans on
cuDNN im2col (`nn.Unfold`/`F.fold`); here unfold is strided slicing and
fold its linear transpose (see ops/unfold.py), which XLA fuses tightly.

A fused Pallas kernel with identical semantics lives in
ops/outlook_pallas.py; this implementation is the bit-check oracle and the
autodiff-friendly default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from autoprog_tpu.ops.unfold import unfold_nhwc, fold_nhwc


def _softmax_compute_dtype(logits, scale, dtype):
    """Softmax with the [.., k^2, k^2] attention matrices materialized in
    the compute dtype (half the HBM traffic of f32 when bf16; the
    reference under apex AMP materializes fp16 the same way); exp and the
    normalizing sum still accumulate in f32."""
    s = (logits.astype(jnp.float32) * scale).astype(dtype)
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s.astype(jnp.float32))
    return (e / e.sum(axis=-1, keepdims=True)).astype(dtype)


def outlook_attention_blockdiag(v: jax.Array, attn_logits: jax.Array, *,
                                num_heads: int, kernel_size: int,
                                stride: int, padding: int, scale: float,
                                group: int = 7) -> jax.Array:
    """Outlook attention with the attend as an MXU block-diagonal matmul.

    The per-(token, head) attend is a k² x k² contraction — far too small
    for the 128x128 MXU on its own. Merging `group` tokens into one
    block-diagonal [g·k², g·k²] matrix per head makes the contraction
    MXU-sized at the cost of a g-fold inflation of the attention tensor
    (the off-diagonal zeros). Numerically identical to
    `outlook_attention` (same softmax, same accumulation dtype discipline
    modulo f32-sum vs matmul accumulation).
    """
    B, H, W, C = v.shape
    k = kernel_size
    h = math.ceil(H / stride)
    w = math.ceil(W / stride)
    d = C // num_heads
    kk = k * k
    n = h * w
    g = group
    if n % g:  # fall back when the token count doesn't tile
        return outlook_attention(v, attn_logits, num_heads=num_heads,
                                 kernel_size=k, stride=stride,
                                 padding=padding, scale=scale)
    m = n // g

    patches = unfold_nhwc(v, k, stride, padding)          # [B,h,w,k,k,C]
    attn = attn_logits.reshape(B, n, num_heads, kk, kk)
    attn = _softmax_compute_dtype(attn, scale, v.dtype)

    # block-diagonal merge: A_blk[b,m,hd, t*kk+p, t'*kk+q] =
    #   attn[b, m*g+t, hd, p, q] * (t == t')
    eye = jnp.eye(g, dtype=attn.dtype)
    A = attn.reshape(B, m, g, num_heads, kk, kk).transpose(0, 1, 3, 2, 4, 5)
    A = A[:, :, :, :, :, None, :] * eye[:, None, :, None]  # [B,m,hd,g,p,g',q]
    A = A.reshape(B, m, num_heads, g * kk, g * kk)

    P = patches.reshape(B, m, g, kk, num_heads, d)
    P = P.transpose(0, 1, 4, 2, 3, 5).reshape(B, m, num_heads, g * kk, d)
    O = jnp.einsum("bmhij,bmhjd->bmhid", A, P,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    O = O.reshape(B, m, num_heads, g, kk, d).transpose(0, 1, 3, 4, 2, 5)
    out = O.reshape(B, h, w, k, k, C)
    return fold_nhwc(out, (H, W), kernel_size=k, stride=stride,
                     padding=padding)


def outlook_attention(v: jax.Array, attn_logits: jax.Array, *,
                      num_heads: int, kernel_size: int, stride: int,
                      padding: int, scale: float) -> jax.Array:
    """Apply outlook attention.

    Args:
      v: projected values, [B, H, W, C] (C = num_heads * head_dim).
      attn_logits: per-window attention logits from the pooled feature map,
        [B, h, w, num_heads * k^4] with h = ceil(H/stride).
      scale: attention scale (head_dim ** -0.5).

    Returns: [B, H, W, C] attended values (pre output-projection).
    """
    B, H, W, C = v.shape
    k = kernel_size
    h = math.ceil(H / stride)
    w = math.ceil(W / stride)
    head_dim = C // num_heads

    kk = k * k
    # Force the projected values to materialize before the unfold: the
    # unfold reads v through k^2 strided-slice consumers, and in
    # forward-only programs XLA fuses the producing v matmul into each
    # consumer, recomputing it per slice on the VPU — measured 43.6 vs
    # 4.1 ms per layer at b=128 with the barrier (the train step never
    # hit this because the backward residuals force materialization).
    v = jax.lax.optimization_barrier(v)
    patches = unfold_nhwc(v, k, stride, padding)          # [B,h,w,k,k,C]
    patches = patches.reshape(B, h * w, kk, C)            # natural layout

    attn = attn_logits.reshape(B, h * w, num_heads, kk, kk)
    attn = _softmax_compute_dtype(attn, scale, v.dtype)

    # out[b,n,p,c] = sum_q attn[b,n,head(c),p,q] * patches[b,n,q,c].
    # The per-(token, head) kk x kk matmul is far too small for the MXU
    # (a batched-matmul lowering pads each to a full 128x128 pass); the
    # lane-aligned broadcast-multiply-sum keeps C in the lane dimension
    # and runs on the VPU — measured ~1.8x faster than the einsum form.
    attn = attn.transpose(0, 1, 3, 4, 2)                  # [B,n,p,q,heads]
    attn_c = jnp.repeat(attn, head_dim, axis=-1)          # [B,n,p,q,C]
    out = jnp.sum(attn_c * patches[:, :, None].astype(attn_c.dtype),
                  axis=3, dtype=jnp.float32).astype(v.dtype)  # [B,n,p,C]
    out = out.reshape(B, h, w, k, k, C)
    return fold_nhwc(out, (H, W), kernel_size=k, stride=stride,
                     padding=padding)
