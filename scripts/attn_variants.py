"""Experimental MHSA forward-kernel variants for the on-chip A/B
(`scripts/bench_attn.py` / chip job 45_attn_opt.sh).

Motivation (PERF.md round-5 roofline): the transformer segment runs at
1.5x its HBM floor and ~81% of it is the fused attention kernel. Pass
accounting of the shipped kernel (`ops/attention_pallas.py`) says its
FORWARD runs at ~126 MXU-cycles per 128x128x128 pass while its BACKWARD
achieves ~70: the backward issues 20 independent matmul passes per head
back-to-back, while the forward's per-head chain is
qk (MXU) -> softmax (VPU) -> av (MXU), so the VPU softmax sits on the
MXU's critical path once per head. These variants restructure the
forward to decouple MXU and VPU work; the backward kernel is reused
unchanged (it already pipelines).

Variants (all bit-compatible contracts with `mhsa_fused_qkv` unless
noted):
  * twophase  — ALL per-head qk matmuls first (scores parked in VMEM
    temporaries, f32), then a second loop of softmax+av. The qk passes
    pipeline like the backward's; each head's av overlaps the next
    head's softmax. Extra VMEM: heads x [n, n] f32 ~ 2.5 MB at the volo
    shape — fits v5e VMEM next to the [n, 3C] input block.
  * twophase_bf16s — same, scores parked bf16 (half the VMEM/temp
    traffic). NUMERICS: matches the model's unfused XLA path at
    N >= 128 (layers.py casts scaled logits to compute dtype), i.e.
    slightly LOOSER than the shipped kernel's all-f32 scores.
  * pipelined — software-pipelined single loop: head hi+1's qk is
    issued before head hi's softmax+av consumes its score, giving the
    scheduler one head of lookahead with only 2 live score matrices.

Reference analogue of the op being tuned: the MHSA of the VOLO
transformer blocks (`/root/reference/models/volo.py:170-201`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autoprog_tpu.ops.attention_pallas import _qkv_slices, _qkv_spec


def _qk(qkv_ref, C, d, scale, hi, score_dtype=jnp.float32):
    q = qkv_ref[0, :, hi * d:(hi + 1) * d]
    k = qkv_ref[0, :, C + hi * d:C + (hi + 1) * d]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s.astype(score_dtype)


def _sm_av(qkv_ref, o_ref, C, d, hi, s):
    v = qkv_ref[0, :, 2 * C + hi * d:2 * C + (hi + 1) * d]
    s = s.astype(jnp.float32)
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    z = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, :, hi * d:(hi + 1) * d] = (o / z).astype(o_ref.dtype)


def _fwd_kernel_twophase(scale, num_heads, score_dtype, qkv_ref, o_ref):
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    scores = [_qk(qkv_ref, C, d, scale, hi, score_dtype)
              for hi in range(num_heads)]
    for hi in range(num_heads):
        _sm_av(qkv_ref, o_ref, C, d, hi, scores[hi])


def _fwd_kernel_pipelined(scale, num_heads, qkv_ref, o_ref):
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    s_cur = _qk(qkv_ref, C, d, scale, 0)
    for hi in range(num_heads):
        s_next = (_qk(qkv_ref, C, d, scale, hi + 1)
                  if hi + 1 < num_heads else None)
        _sm_av(qkv_ref, o_ref, C, d, hi, s_cur)
        s_cur = s_next


_KERNELS = {
    "twophase": lambda scale, h: functools.partial(
        _fwd_kernel_twophase, scale, h, jnp.float32),
    "twophase_bf16s": lambda scale, h: functools.partial(
        _fwd_kernel_twophase, scale, h, jnp.bfloat16),
    "pipelined": lambda scale, h: functools.partial(
        _fwd_kernel_pipelined, scale, h),
}


def mhsa_fwd_variant(name: str, qkv, num_heads: int, scale: float,
                     interpret: bool = False):
    """Forward-only variant call, same contract as mhsa_fused_qkv."""
    B, n, C3 = qkv.shape
    C = C3 // 3
    return pl.pallas_call(
        _KERNELS[name](scale, num_heads),
        out_shape=jax.ShapeDtypeStruct((B, n, C), qkv.dtype),
        grid=(B,),
        in_specs=[_qkv_spec(n, C3)],
        out_specs=_qkv_spec(n, C),
        interpret=interpret,
    )(qkv)


def mhsa_variant_with_shared_bwd(name: str):
    """Variant forward + the SHIPPED backward kernel, for fwd+bwd timing
    (the backward already pipelines at ~70 cycles/pass; only the forward
    is under test)."""
    from autoprog_tpu.ops import attention_pallas as ap

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
    def fn(qkv, num_heads, scale, interpret=False):
        return mhsa_fwd_variant(name, qkv, num_heads, scale, interpret)

    def fwd(qkv, num_heads, scale, interpret=False):
        return fn(qkv, num_heads, scale, interpret), (qkv,)

    def bwd(num_heads, scale, interpret, res, g):
        (qkv,) = res
        return (ap._qkv_bwd_raw(qkv, g, num_heads, scale, interpret),)

    fn.defvjp(fwd, bwd)
    return fn
