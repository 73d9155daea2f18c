#!/usr/bin/env python
"""Microbench: outlook-attention formulations at the volo_d1 stage-0 shape.

Compares the lane-aligned broadcast-sum (current default), the MXU
block-diagonal merge (several group sizes), and optionally the Pallas
kernel, fwd and fwd+bwd. fori_loop-chained timing with a D2H readback
(PERF.md methodology).

Usage: python scripts/bench_outlook.py [batch]
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

    from autoprog_tpu.ops.outlook import (outlook_attention,
                                          outlook_attention_blockdiag)

    on_tpu = jax.devices()[0].platform != "cpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 4)
    H = W = 28            # 224/8 stage-0 grid
    C, heads = 192, 6     # volo_d1
    iters = 30 if on_tpu else 2
    scale = (C // heads) ** -0.5

    rs = np.random.RandomState(0)
    v = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    attn = jnp.asarray(rs.randn(B, H // 2, W // 2, heads * 81), jnp.bfloat16)

    def timeit(fn, *args):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                # acc feeds the input so XLA LICM can't hoist the body
                a2 = (a[0] + acc * 1e-30,) + a[1:]
                return jnp.sum(fn(*a2).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        r = loop(*args)
        float(r)
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / iters

    kw = dict(num_heads=heads, kernel_size=3, stride=2, padding=1,
              scale=scale)

    from autoprog_tpu.ops.outlook import outlook_attention_cvjp
    variants = {"broadcast (default)": functools.partial(
        outlook_attention, **kw),
        "broadcast custom-vjp": functools.partial(
        outlook_attention_cvjp, **kw)}
    if "--blockdiag" in sys.argv:
        for g in (4, 7, 14, 28):
            variants[f"blockdiag g={g}"] = functools.partial(
                outlook_attention_blockdiag, group=g, **kw)
    if on_tpu and "--pallas" in sys.argv:
        from autoprog_tpu.ops.outlook_pallas import (
            outlook_attention_fused, outlook_attention_hybrid,
            outlook_attention_hybrid2)
        variants["pallas fused v1 (repeat)"] = (
            lambda v, a: outlook_attention_fused(v, a, heads, scale))
        variants["pallas hybrid (repeat)"] = (
            lambda v, a: outlook_attention_hybrid(v, a, heads, scale))
        variants["pallas hybrid2 (E-matmul)"] = (
            lambda v, a: outlook_attention_hybrid2(v, a, heads, scale))

    print(f"B={B} H=W={H} C={C} heads={heads}  ({iters} iters)",
          file=sys.stderr)
    for name, fn in variants.items():
        t_f = timeit(fn, v, attn)

        def loss(v, a, fn=fn):
            return jnp.sum(fn(v, a).astype(jnp.float32) ** 2)
        g_fn = jax.grad(loss, argnums=(0, 1))

        def both(v, a, g_fn=g_fn):
            gv, ga = g_fn(v, a)
            return jnp.sum(gv.astype(jnp.float32)) + jnp.sum(
                ga.astype(jnp.float32))
        t_b = timeit(both, v, attn)
        print(f"{name:<24s} fwd {t_f * 1e3:7.2f} ms   fwd+bwd "
              f"{t_b * 1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
