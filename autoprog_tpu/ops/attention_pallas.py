"""Fused short-sequence MHSA Pallas kernel.

The VOLO transformer stack runs 14 layers of MHSA at n=196 tokens with
head_dim 32 (reference `models/volo.py:170-201`). At this size the XLA
lowering materializes the [B, heads, n, n] logits in HBM (59M elements at
b=128 — measured ~4.5 ms/layer fwd+bwd of mostly softmax/HBM traffic,
`scripts/bench_attn.py`); the stock flash-attention kernel is worse still
(its blocking targets long sequences). This kernel keeps one
(image, head) slice entirely in VMEM: q/k/v stream in, the [n, n] score
matrix lives and dies on-chip, only the [n, d] output returns to HBM.

Layout: the kernel operates on [B, heads, n, d] (grid over (B, heads),
block = one head slice with the last two block dims equal to the array
dims — a Mosaic requirement). The public wrapper accepts the natural
[B, n, heads, d] coming out of the fused qkv projection and transposes at
the boundary (XLA fuses these with the surrounding reshapes; measured in
the kernel's favor).

Backward is a second kernel that recomputes the probabilities
(flash-style) and emits dq/dk/dv in one pass.

Numerics: qk accumulates f32 on the MXU; scores materialize at the
COMPUTE dtype (bf16 in production — the same discipline as the XLA path
in models/layers.py at N >= 128 and as the reference's apex-AMP fp16
logits; AUTOPROG_ATTN_SCORES_F32=1 restores all-f32 scores); softmax
subtract-max and normalization in f32; probabilities cast to compute
dtype for the AV matmul. The backward recomputes scores at the same
dtype, so it differentiates exactly the function the forward ran.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(scale, num_heads, q_ref, k_ref, v_ref, o_ref):
    # one image per program, static loop over heads: blocks are big
    # enough (heads*n*d) to keep the DMA pipeline busy, and every [n, n]
    # score matrix lives only in VMEM/registers
    for hi in range(num_heads):
        q = q_ref[0, hi]                              # [n, d]
        k = k_ref[0, hi]
        v = v_ref[0, hi]
        # scale folded into q ([n,d]) and the normalizer into the output
        # ([n,d]): the only full [n,n] passes are the matmul, max, exp
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        z = jnp.sum(e, axis=-1, keepdims=True)        # [n, 1] f32
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0, hi] = (o / z).astype(v.dtype)


def _bwd_kernel(scale, num_heads, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    for hi in range(num_heads):
        q = q_ref[0, hi]
        k = k_ref[0, hi]
        v = v_ref[0, hi]
        do = do_ref[0, hi]                            # [n, d]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _softmax_rows(s)                          # f32 [n, n]
        pc = p.astype(v.dtype)
        # dv[m, f] = sum_n p[n, m] * do[n, f]
        dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp[n, m] = sum_f do[n, f] * v[m, f]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        # dq = scale * (ds @ k); dk = ds^T @ (scale * q) — scale rides the
        # [n, d] operands, not the [n, n] matrix
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, hi] = dq.astype(dq_ref.dtype)
        dk_ref[0, hi] = dk.astype(dk_ref.dtype)
        dv_ref[0, hi] = dv.astype(dv_ref.dtype)


def _spec(h, n, d):
    return pl.BlockSpec((1, h, n, d), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mhsa_fused(q, k, v, scale: float, interpret: bool = False):
    """Fused MHSA: softmax(q @ k^T * scale) @ v per (image, head).

    q, k, v: [B, n, heads, d]; returns [B, n, heads, d].
    """
    return _mhsa_fwd_call(q, k, v, scale, interpret)


def _hfirst(x):
    return jnp.moveaxis(x, 2, 1)                      # [B,n,h,d]->[B,h,n,d]


def _hmid(x):
    return jnp.moveaxis(x, 1, 2)                      # [B,h,n,d]->[B,n,h,d]


def _mhsa_fwd_call(q, k, v, scale, interpret):
    B, n, h, d = q.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale, h),
        out_shape=jax.ShapeDtypeStruct((B, h, n, d), v.dtype),
        grid=(B,),
        in_specs=[_spec(h, n, d)] * 3,
        out_specs=_spec(h, n, d),
        interpret=interpret,
    )(_hfirst(q), _hfirst(k), _hfirst(v))
    return _hmid(out)


def _mhsa_fwd(q, k, v, scale, interpret):
    return _mhsa_fwd_call(q, k, v, scale, interpret), (q, k, v)


def _mhsa_bwd(scale, interpret, res, g):
    q, k, v = res
    B, n, h, d = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale, h),
        out_shape=[jax.ShapeDtypeStruct((B, h, n, d), x.dtype)
                   for x in (q, k, v)],
        grid=(B,),
        in_specs=[_spec(h, n, d)] * 4,
        out_specs=[_spec(h, n, d)] * 3,
        interpret=interpret,
    )(_hfirst(q), _hfirst(k), _hfirst(v), _hfirst(g))
    return _hmid(dq), _hmid(dk), _hmid(dv)


mhsa_fused.defvjp(_mhsa_fwd, _mhsa_bwd)


# ---------------------------------------------------------------------------
# Boundary-free variant: consume the RAW fused-qkv Dense output [B, n, 3C]
# and emit the natural [B, n, C] the out-projection wants. The original
# mhsa_fused wins fwd+bwd in isolation but loses end-to-end because the
# [B,n,3,h,d] -> 3x[B,h,n,d] relayouts XLA folds into the einsum for free
# become explicit HBM transposes at the pallas_call boundary (PERF.md).
# Here the head split happens IN VMEM as static 32-lane slices of the
# [n, 3C] block — the kernel's in/out layouts are exactly what the
# surrounding matmuls produce/consume, so XLA has nothing to relayout.
# Channel order matches layers.py's reshape(N, 3, heads, d): lane index
# j*C + h*d + d_i for j in (q, k, v).


def _qkv_slices(qkv_ref, C: int, d: int, hi: int):
    q = qkv_ref[0, :, hi * d:(hi + 1) * d]
    k = qkv_ref[0, :, C + hi * d:C + (hi + 1) * d]
    v = qkv_ref[0, :, 2 * C + hi * d:2 * C + (hi + 1) * d]
    return q, k, v


#: park all heads' score matrices in VMEM (two-phase forward) only while
#: they fit comfortably next to the [n, 3C] input block
_TWOPHASE_VMEM_BUDGET = 4 * 1024 * 1024


def _qk_scores(qkv_ref, C, d, scale, hi, score_dtype):
    """q @ k^T in f32 on the MXU, materialized at score_dtype.

    score_dtype follows the COMPUTE dtype by default (round 5): bf16
    scores match the model's unfused XLA path at N >= 128 (layers.py
    casts scaled logits to compute dtype; the reference under apex AMP
    materializes fp16 logits) and measured +7% fwd+bwd on-chip
    (PERF.md r5, 45_attn_opt). AUTOPROG_ATTN_SCORES_F32=1 restores the
    all-f32 scores of rounds 1-4."""
    q = qkv_ref[0, :, hi * d:(hi + 1) * d]
    k = qkv_ref[0, :, C + hi * d:C + (hi + 1) * d]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s.astype(score_dtype)


def _sm_av(qkv_ref, o_ref, C, d, hi, s):
    """softmax rows of s (f32 accumulation) and the attend matmul."""
    v = qkv_ref[0, :, 2 * C + hi * d:2 * C + (hi + 1) * d]
    s = s.astype(jnp.float32)
    e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    z = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, :, hi * d:(hi + 1) * d] = (o / z).astype(o_ref.dtype)


def _fwd_kernel_qkv(scale, num_heads, scores_f32, qkv_ref, o_ref):
    # Two-phase forward (round 5, measured +4.5% fwd+bwd bit-identical,
    # +7% with compute-dtype scores): phase A issues every head's qk
    # matmul back-to-back so the MXU passes pipeline like the backward's,
    # phase B overlaps each head's VPU softmax with the next head's av
    # matmul. Falls back to the per-head chain when parking all heads'
    # scores would not fit VMEM (large-n supernet shapes).
    n = qkv_ref.shape[1]
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    sdt = jnp.float32 if scores_f32 else qkv_ref.dtype
    if num_heads * n * n * jnp.dtype(sdt).itemsize <= _TWOPHASE_VMEM_BUDGET:
        scores = [_qk_scores(qkv_ref, C, d, scale, hi, sdt)
                  for hi in range(num_heads)]
        for hi in range(num_heads):
            _sm_av(qkv_ref, o_ref, C, d, hi, scores[hi])
    else:
        for hi in range(num_heads):
            _sm_av(qkv_ref, o_ref, C, d, hi,
                   _qk_scores(qkv_ref, C, d, scale, hi, sdt))


def _bwd_kernel_qkv(scale, num_heads, scores_f32, qkv_ref, do_ref,
                    dqkv_ref):
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    sdt = jnp.float32 if scores_f32 else qkv_ref.dtype
    for hi in range(num_heads):
        q, k, v = _qkv_slices(qkv_ref, C, d, hi)
        do = do_ref[0, :, hi * d:(hi + 1) * d]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # recompute at the SAME score dtype as the forward so the
        # backward differentiates exactly the function the forward ran
        p = _softmax_rows(s.astype(sdt).astype(jnp.float32))
        pc = p.astype(v.dtype)
        dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, hi * d:(hi + 1) * d] = dq.astype(dt)
        dqkv_ref[0, :, C + hi * d:C + (hi + 1) * d] = dk.astype(dt)
        dqkv_ref[0, :, 2 * C + hi * d:2 * C + (hi + 1) * d] = dv.astype(dt)


def _qkv_spec(n, c):
    return pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def mhsa_fused_qkv(qkv, num_heads: int, scale: float,
                   interpret: bool = False):
    """Fused MHSA on the raw qkv projection.

    qkv: [B, n, 3C] straight out of the fused qkv Dense (channel order
    (3, heads, head_dim)); returns [B, n, C] ready for the out-projection.
    Replaces the reference's unfused qkv reshape + bmm chain
    (`models/volo.py:185-201`) with one VMEM-resident program per image.

    Multi-chip safe: both pallas_calls carry a custom_partitioning rule
    that propagates BATCH-dim sharding (the grid dim) and replicates the
    token/channel dims, so under data-parallel pjit the SPMD partitioner
    runs the kernel per-shard instead of all-gathering the activations
    (pallas_call alone is opaque to it).
    """
    return _qkv_fwd_call(qkv, num_heads, scale, interpret)


def _scores_f32() -> bool:
    import os
    return os.environ.get("AUTOPROG_ATTN_SCORES_F32", "0") == "1"


def _qkv_fwd_raw(qkv, num_heads, scale, interpret, scores_f32=None):
    B, n, C3 = qkv.shape
    C = C3 // 3
    sf = _scores_f32() if scores_f32 is None else scores_f32
    return pl.pallas_call(
        functools.partial(_fwd_kernel_qkv, scale, num_heads, sf),
        out_shape=jax.ShapeDtypeStruct((B, n, C), qkv.dtype),
        grid=(B,),
        in_specs=[_qkv_spec(n, C3)],
        out_specs=_qkv_spec(n, C),
        interpret=interpret,
    )(qkv)


def _qkv_bwd_raw(qkv, g, num_heads, scale, interpret, scores_f32=None):
    B, n, C3 = qkv.shape
    C = C3 // 3
    sf = _scores_f32() if scores_f32 is None else scores_f32
    return pl.pallas_call(
        functools.partial(_bwd_kernel_qkv, scale, num_heads, sf),
        out_shape=jax.ShapeDtypeStruct((B, n, C3), qkv.dtype),
        grid=(B,),
        in_specs=[_qkv_spec(n, C3), _qkv_spec(n, C)],
        out_specs=_qkv_spec(n, C3),
        interpret=interpret,
    )(qkv, g)


def _batch_dim_partition(impl, n_args):
    """partition/infer callbacks keeping only the dim-0 (batch) sharding."""
    from jax.sharding import NamedSharding, PartitionSpec

    def _bspec(shape_with_sharding):
        spec = shape_with_sharding.sharding.spec
        return spec[0] if len(spec) else None

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0])
        row = lambda nd: NamedSharding(
            mesh, PartitionSpec(b, *([None] * (nd - 1))))
        in_sh = tuple(row(len(a.shape)) for a in arg_shapes[:n_args])
        out_sh = row(len(result_shape.shape))
        return mesh, impl, out_sh, in_sh

    def infer(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes[0])
        from jax.sharding import NamedSharding as NS, PartitionSpec as P
        return NS(mesh, P(b, *([None] * (len(result_shape.shape) - 1))))

    return partition, infer


@functools.lru_cache(maxsize=None)
def _qkv_fwd_partitioned(num_heads, scale, interpret, scores_f32):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(qkv):
        return _qkv_fwd_raw(qkv, num_heads, scale, interpret, scores_f32)

    cp = custom_partitioning(impl)
    partition, infer = _batch_dim_partition(impl, 1)
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule="b n c -> b n d",
                     need_replication_factors=("n", "c", "d"))
    return cp


@functools.lru_cache(maxsize=None)
def _qkv_bwd_partitioned(num_heads, scale, interpret, scores_f32):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(qkv, g):
        return _qkv_bwd_raw(qkv, g, num_heads, scale, interpret, scores_f32)

    cp = custom_partitioning(impl)
    partition, infer = _batch_dim_partition(impl, 2)
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule="b n c, b n d -> b n c",
                     need_replication_factors=("n", "c", "d"))
    return cp


def _qkv_fwd_call(qkv, num_heads, scale, interpret):
    return _qkv_fwd_partitioned(num_heads, scale, interpret,
                                _scores_f32())(qkv)


def _qkv_fwd(qkv, num_heads, scale, interpret):
    return _qkv_fwd_call(qkv, num_heads, scale, interpret), (qkv,)


def _qkv_bwd(num_heads, scale, interpret, res, g):
    (qkv,) = res
    return (_qkv_bwd_partitioned(num_heads, scale, interpret,
                                 _scores_f32())(qkv, g),)


mhsa_fused_qkv.defvjp(_qkv_fwd, _qkv_bwd)
