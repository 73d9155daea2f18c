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

    patches = unfold_nhwc(v, k, stride, padding)          # [B,h,w,k,k,C]
    patches = patches.reshape(B, h * w, k * k, num_heads, head_dim)

    attn = attn_logits.reshape(B, h * w, num_heads, k * k, k * k)
    attn = attn.astype(jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)

    # out[b,n,h,p,d] = sum_q attn[b,n,h,p,q] * patches[b,n,q,h,d]
    out = jnp.einsum("bnhpq,bnqhd->bnphd", attn, patches,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.reshape(B, h, w, k, k, C)
    return fold_nhwc(out, (H, W), kernel_size=k, stride=stride,
                     padding=padding)
