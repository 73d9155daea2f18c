#!/usr/bin/env python
"""Experimental MHSA kernel variants vs the shipped mhsa_fused_qkv.

VERDICT r4 #4: the transformer stack measures 1.5x above its HBM floor
(54 vs 35 ms; scripts/bench_roofline.py). The attention core is
MXU-PASS-LATENCY bound, not FLOP or HBM bound: 24 small matmuls per
image program ([196,32]x[32,196] QK^T at 25% lane depth + [196,196]x
[196,32] PV), serialized with the per-head VPU softmax. Variants probe
the two levers that don't change the math:

  phase  — split the head loop into phases (all QK^T -> all softmax ->
           all PV) so Mosaic can issue the MXU matmuls back-to-back and
           overlap the VPU softmax phase with nothing blocking it;
  imgG   — G images per program (grid B/G): more independent matmuls
           in flight per program, fewer grid iterations/DMAs;
  phase_imgG — both.

Every variant is bit-checked against mhsa_fused_qkv before timing
(identical per-head op order => identical floats). fori_loop-chained
timing with a D2H readback (PERF.md methodology).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qkv_slices(qkv_ref, C, d, gi, hi):
    q = qkv_ref[gi, :, hi * d:(hi + 1) * d]
    k = qkv_ref[gi, :, C + hi * d:C + (hi + 1) * d]
    v = qkv_ref[gi, :, 2 * C + hi * d:2 * C + (hi + 1) * d]
    return q, k, v


def _fwd_phase_kernel(scale, num_heads, G, qkv_ref, o_ref):
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    cells = [(gi, hi) for gi in range(G) for hi in range(num_heads)]
    ss = []
    for gi, hi in cells:
        q, k, _ = _qkv_slices(qkv_ref, C, d, gi, hi)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        ss.append(jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    es, zs = [], []
    for s in ss:
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        es.append(e)
        zs.append(jnp.sum(e, axis=-1, keepdims=True))
    for (gi, hi), e, z in zip(cells, es, zs):
        _, _, v = _qkv_slices(qkv_ref, C, d, gi, hi)
        o = jnp.dot(e.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[gi, :, hi * d:(hi + 1) * d] = (o / z).astype(o_ref.dtype)


def _fwd_loop_kernel(scale, num_heads, G, qkv_ref, o_ref):
    """Same op order as the shipped kernel, G images per program."""
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    for gi in range(G):
        for hi in range(num_heads):
            q, k, v = _qkv_slices(qkv_ref, C, d, gi, hi)
            qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            z = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[gi, :, hi * d:(hi + 1) * d] = (o / z).astype(o_ref.dtype)


def _bwd_phase_kernel(scale, num_heads, G, qkv_ref, do_ref, dqkv_ref):
    C = qkv_ref.shape[2] // 3
    d = C // num_heads
    cells = [(gi, hi) for gi in range(G) for hi in range(num_heads)]
    ss = []
    for gi, hi in cells:
        q, k, _ = _qkv_slices(qkv_ref, C, d, gi, hi)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        ss.append(jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    ps = []
    for s in ss:
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        ps.append(e / jnp.sum(e, axis=-1, keepdims=True))
    dps = []
    for (gi, hi), p in zip(cells, ps):
        _, _, v = _qkv_slices(qkv_ref, C, d, gi, hi)
        do = do_ref[gi, :, hi * d:(hi + 1) * d]
        pc = p.astype(v.dtype)
        dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqkv_ref[gi, :, 2 * C + hi * d:2 * C + (hi + 1) * d] = \
            dv.astype(dqkv_ref.dtype)
        dps.append(jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dss = []
    for p, dp in zip(ps, dps):
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dss.append(ds.astype(qkv_ref.dtype))
    for (gi, hi), ds in zip(cells, dss):
        q, k, _ = _qkv_slices(qkv_ref, C, d, gi, hi)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dt = dqkv_ref.dtype
        dqkv_ref[gi, :, hi * d:(hi + 1) * d] = dq.astype(dt)
        dqkv_ref[gi, :, C + hi * d:C + (hi + 1) * d] = dk.astype(dt)


def make_variant(fwd_kernel, bwd_kernel, G, heads, scale,
                 vmem_mb=None):
    """Build a custom-vjp qkv attention from (fwd, bwd) kernel bodies."""
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def spec(n, c):
        return pl.BlockSpec((G, n, c), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_raw(qkv):
        B, n, C3 = qkv.shape
        C = C3 // 3
        return pl.pallas_call(
            functools.partial(fwd_kernel, scale, heads, G),
            out_shape=jax.ShapeDtypeStruct((B, n, C), qkv.dtype),
            grid=(B // G,), in_specs=[spec(n, C3)], out_specs=spec(n, C),
            **params)(qkv)

    def bwd_raw(qkv, g):
        B, n, C3 = qkv.shape
        C = C3 // 3
        return pl.pallas_call(
            functools.partial(bwd_kernel, scale, heads, G),
            out_shape=jax.ShapeDtypeStruct((B, n, C3), qkv.dtype),
            grid=(B // G,), in_specs=[spec(n, C3), spec(n, C)],
            out_specs=spec(n, C3), **params)(qkv, g)

    @jax.custom_vjp
    def attn(qkv):
        return fwd_raw(qkv)

    attn.defvjp(lambda qkv: (fwd_raw(qkv), qkv),
                lambda res, g: (bwd_raw(res, g),))
    return attn


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 4)
    n, heads, d = 196, 12, 32
    C = heads * d
    iters = 30 if on_tpu else 2
    scale = d ** -0.5
    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(B, n, 3 * C), jnp.bfloat16)

    from autoprog_tpu.ops.attention_pallas import mhsa_fused_qkv
    base = lambda x: mhsa_fused_qkv(x, heads, scale)

    def timeit(fn):
        @jax.jit
        def loop(x):
            def body(i, acc):
                return jnp.sum(fn(x + acc * 1e-30).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        float(loop(qkv))
        t0 = time.perf_counter()
        float(loop(qkv))
        return (time.perf_counter() - t0) / iters

    def timeit_bwd(fn):
        def loss(x):
            return jnp.sum(fn(x).astype(jnp.float32) ** 2)
        g = jax.grad(loss)
        return timeit(lambda x: jnp.sum(g(x).astype(jnp.float32))
                      [None, None, None])

    ref_f = jax.jit(base)(qkv)
    ref_g = jax.jit(jax.grad(lambda x: jnp.sum(
        base(x).astype(jnp.float32) ** 2)))(qkv)

    variants = {"base (mhsa_fused_qkv)": base}
    for G in (1, 2, 4):
        if B % G:
            continue
        variants[f"phase_img{G}"] = make_variant(
            _fwd_phase_kernel, _bwd_phase_kernel, G, heads, scale,
            vmem_mb=96)
        if G > 1:
            variants[f"loop_img{G}"] = make_variant(
                _fwd_loop_kernel, _bwd_phase_kernel, G, heads, scale,
                vmem_mb=96)

    print(f"B={B} n={n} heads={heads} d={d}  ({iters} iters)", flush=True)
    for name, fn in variants.items():
        try:
            out = jax.jit(fn)(qkv)
            bit_f = bool(jnp.all(out == ref_f))
            gv = jax.jit(jax.grad(lambda x: jnp.sum(
                fn(x).astype(jnp.float32) ** 2)))(qkv)
            bit_g = bool(jnp.all(gv == ref_g))
            t_f = timeit(fn)
            t_b = timeit_bwd(fn)
            print(f"{name:<24s} fwd {t_f * 1e3:7.2f} ms   fwd+bwd "
                  f"{t_b * 1e3:7.2f} ms   bitexact fwd={bit_f} bwd={bit_g}",
                  flush=True)
        except Exception as e:
            print(f"{name:<24s} FAILED: {type(e).__name__} "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
