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

import functools
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


# -- custom-VJP variant (documented LOSING experiment) -----------------------
# Hypothesis: XLA's autodiff threads a [B,n,k²,k²,C]-wide cotangent between
# the sum-VJP and the repeat-VJP, and a hand-written backward that computes
# d_attn head-grouped would avoid it. MEASURED FALSE on v5e (bench_outlook):
# fwd+bwd 15.04 ms/layer vs 7.72 for plain autodiff at b=128 — XLA already
# fuses the reduce into its producer, and the head-grouped einsum
# ('bnphd,bnqhd->bnhpq', a [9,32]x[32,9] batched matmul per (image, token,
# head)) is MXU-hostile at this size. Autodiff of the broadcast form is the
# right answer; kept as a tested record of the experiment (PERF.md).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _outlook_cvjp(v, attn_logits, num_heads, kernel_size, stride, padding,
                  scale):
    return outlook_attention(v, attn_logits, num_heads=num_heads,
                             kernel_size=kernel_size, stride=stride,
                             padding=padding, scale=scale)


def _outlook_cvjp_fwd(v, attn_logits, num_heads, kernel_size, stride,
                      padding, scale):
    out = _outlook_cvjp(v, attn_logits, num_heads, kernel_size, stride,
                        padding, scale)
    return out, (v, attn_logits)


def _outlook_cvjp_bwd(num_heads, kernel_size, stride, padding, scale,
                      residuals, g):
    v, attn_logits = residuals
    B, H, W, C = v.shape
    k = kernel_size
    h = math.ceil(H / stride)
    w = math.ceil(W / stride)
    d = C // num_heads
    n = h * w
    kk = k * k

    patches = unfold_nhwc(v, k, stride, padding).reshape(B, n, kk, C)
    attn = attn_logits.reshape(B, n, num_heads, kk, kk)
    attn = _softmax_compute_dtype(attn, scale, v.dtype)   # [B,n,h,p,q]

    # fold's linear adjoint is unfold with the same geometry
    dav = unfold_nhwc(g, k, stride, padding).reshape(B, n, kk, C)

    # d_attn[b,n,h,p,q] = sum_{d} dav[b,n,p,(h,d)] * patches[b,n,q,(h,d)]
    dav6 = dav.reshape(B, n, kk, num_heads, d)
    pat6 = patches.reshape(B, n, kk, num_heads, d)
    datt = jnp.einsum("bnphd,bnqhd->bnhpq", dav6, pat6,
                      preferred_element_type=jnp.float32)
    af = attn.astype(jnp.float32)
    ds = af * (datt - jnp.sum(datt * af, axis=-1, keepdims=True))
    dlogits = (ds * scale).astype(attn_logits.dtype)
    dlogits = dlogits.reshape(B, h, w, num_heads * kk * kk)

    # d_patches: same broadcast-multiply-sum shape as the forward with
    # (p, q) swapped and dav in place of patches
    at = attn.transpose(0, 1, 3, 4, 2)                    # [B,n,p,q,heads]
    at_c = jnp.repeat(at, d, axis=-1)                     # [B,n,p,q,C]
    dpatches = jnp.sum(at_c * dav[:, :, :, None].astype(at_c.dtype),
                       axis=2, dtype=jnp.float32).astype(v.dtype)
    dv = fold_nhwc(dpatches.reshape(B, h, w, k, k, C), (H, W),
                   kernel_size=k, stride=stride, padding=padding)
    return dv, dlogits


_outlook_cvjp.defvjp(_outlook_cvjp_fwd, _outlook_cvjp_bwd)


def outlook_attention_cvjp(v, attn_logits, *, num_heads: int,
                           kernel_size: int, stride: int, padding: int,
                           scale: float) -> jax.Array:
    """`outlook_attention` with the hand-written backward (see above)."""
    return _outlook_cvjp(v, attn_logits, num_heads, kernel_size, stride,
                         padding, scale)
