#!/usr/bin/env python
"""Microbench: MHSA formulations at the volo_d1 transformer shape.

[B, n=196 tokens, C=384, 12 heads, head_dim 32] — the shape of all 14
transformer layers. Compares:
  * the current einsum path (f32 logits materialized in HBM);
  * bf16-materialized logits (half the HBM traffic, lower precision);
  * the JAX Pallas TPU flash-attention kernel (no HBM logits at all),
    padded 196 -> 256 with segment-id masking of the pad tokens.

fori_loop-chained timing with a D2H readback and an acc-dependency so XLA
cannot hoist the pure attention out of the loop (PERF.md methodology).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform != "cpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 4)
    n, heads, d = 196, 12, 32
    C = heads * d
    iters = 30 if on_tpu else 2
    scale = d ** -0.5

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, n, heads, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, n, heads, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, n, heads, d), jnp.bfloat16)

    def attn_einsum_f32(q, k, v):
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def attn_einsum_bf16(q, k, v):
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                       preferred_element_type=jnp.float32)
        s = (s * scale).astype(jnp.bfloat16)
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32))
        p = (e / e.sum(axis=-1, keepdims=True)).astype(q.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def attn_flash(q, k, v, n_pad=256):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        pad = n_pad - n
        qt = jnp.moveaxis(q, 2, 1)  # [B,h,n,d]
        kt = jnp.moveaxis(k, 2, 1)
        vt = jnp.moveaxis(v, 2, 1)
        qt, kt, vt = (jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                      for x in (qt, kt, vt))
        seg = jnp.where(jnp.arange(n_pad) < n, 0, 1).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (B, n_pad))
        out = fa.flash_attention(
            qt, kt, vt,
            segment_ids=fa.SegmentIds(q=seg, kv=seg),
            sm_scale=scale)
        return jnp.moveaxis(out[:, :, :n, :], 1, 2)

    def timeit(fn):
        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                return jnp.sum(fn(q + acc * 1e-30, k, v)
                               .astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        r = loop(q, k, v)
        float(r)
        t0 = time.perf_counter()
        float(loop(q, k, v))
        return (time.perf_counter() - t0) / iters

    def timeit_bwd(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2))

        def both(q, k, v):
            gq, gk, gv = g(q, k, v)
            return (jnp.sum(gq.astype(jnp.float32))
                    + jnp.sum(gk.astype(jnp.float32))
                    + jnp.sum(gv.astype(jnp.float32)))
        return timeit(lambda q, k, v: both(q, k, v)[None, None, None, None])

    variants = {
        "einsum f32 logits (default)": attn_einsum_f32,
        "einsum bf16 logits": attn_einsum_bf16,
    }
    if on_tpu:
        variants["flash (pallas, pad 256)"] = attn_flash
        from autoprog_tpu.ops.attention_pallas import mhsa_fused
        variants["mhsa_fused (ours)"] = (
            lambda q, k, v: mhsa_fused(q, k, v, scale))

    print(f"B={B} n={n} heads={heads} d={d}  ({iters} iters)",
          file=sys.stderr)
    for name, fn in variants.items():
        try:
            t_f = timeit(fn)
            t_b = timeit_bwd(fn)
            print(f"{name:<30s} fwd {t_f * 1e3:7.2f} ms   fwd+bwd "
                  f"{t_b * 1e3:7.2f} ms", file=sys.stderr)
        except Exception as e:
            print(f"{name:<30s} FAILED: {type(e).__name__} {e}",
                  file=sys.stderr)

    # --- qkv-level comparison: includes the boundary relayouts the model
    # actually pays. Input is the raw fused-qkv Dense output [B, n, 3C];
    # output the natural [B, n, C] the out-projection consumes.
    qkv = jnp.asarray(rs.randn(B, n, 3 * C), jnp.bfloat16)

    def split_qkv(qkv):
        qq = qkv.reshape(B, n, 3, heads, d)
        return (jnp.moveaxis(qq, 2, 0)[i] for i in range(3))

    def qkv_xla_bf16(qkv):
        q, k, v = split_qkv(qkv)
        return attn_einsum_bf16(q, k, v).reshape(B, n, C)

    def qkv_old_kernel(qkv):
        from autoprog_tpu.ops.attention_pallas import mhsa_fused
        q, k, v = split_qkv(qkv)
        return mhsa_fused(q, k, v, scale).reshape(B, n, C)

    def qkv_new_kernel(qkv):
        from autoprog_tpu.ops.attention_pallas import mhsa_fused_qkv
        return mhsa_fused_qkv(qkv, heads, scale)

    def timeit1(fn):
        @jax.jit
        def loop(x):
            def body(i, acc):
                return jnp.sum(fn(x + acc * 1e-30).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        float(loop(qkv))
        t0 = time.perf_counter()
        float(loop(qkv))
        return (time.perf_counter() - t0) / iters

    def timeit1_bwd(fn):
        def loss(x):
            return jnp.sum(fn(x).astype(jnp.float32) ** 2)
        g = jax.grad(loss)
        return timeit1(lambda x: jnp.sum(g(x).astype(jnp.float32))
                       [None, None, None])

    qkv_variants = {
        "qkv: xla bf16 logits": qkv_xla_bf16,
        "qkv: mhsa_fused (boundary)": qkv_old_kernel,
        "qkv: mhsa_fused_qkv (new)": qkv_new_kernel,
    } if on_tpu else {}
    if on_tpu:
        # round-5 forward-restructure candidates (scripts/attn_variants.py):
        # attack the fwd kernel's MXU<->VPU serialization (PERF.md r5)
        from scripts.attn_variants import (_KERNELS,
                                           mhsa_variant_with_shared_bwd)
        for vname in _KERNELS:
            vfn = mhsa_variant_with_shared_bwd(vname)
            qkv_variants[f"qkv: variant {vname}"] = (
                lambda x, f=vfn: f(x, heads, scale))
    for name, fn in qkv_variants.items():
        try:
            t_f = timeit1(fn)
            t_b = timeit1_bwd(fn)
            print(f"{name:<30s} fwd {t_f * 1e3:7.2f} ms   fwd+bwd "
                  f"{t_b * 1e3:7.2f} ms", file=sys.stderr)
        except Exception as e:
            print(f"{name:<30s} FAILED: {type(e).__name__} {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
