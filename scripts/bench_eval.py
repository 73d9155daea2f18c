#!/usr/bin/env python
"""Bisect the eval-mode forward cost of volo_d1 (perf tool).

The train step (fwd+bwd+opt) measures ~133 ms at b=128 while the
eval-mode forward alone measures ~195 ms (scripts/bench_parts.py) — this
script ablates eval fwd by keep-mask / model variant / train-mode flag to
find where the time goes.

Usage: python scripts/bench_eval.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from autoprog_tpu.registry import create_model

    on_tpu = jax.devices()[0].platform != "cpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 4)
    iters = 20 if on_tpu else 2

    mdef = create_model("volo_h12_l18")
    model = mdef.make(num_classes=1000, img_size=224, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mixtoken": jax.random.PRNGKey(2)},
        jnp.zeros((1, 224, 224, 3)), train=True))()
    params, stats = variables["params"], variables["batch_stats"]
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(B, 224, 224, 3), jnp.bfloat16)
    L0, L1 = model.layers[0], model.layers[1]

    def timeit(apply_fn):
        @jax.jit
        def loop(params, stats, img):
            def body(i, acc):
                x = img + (acc * 1e-30).astype(img.dtype)
                return jnp.sum(apply_fn(params, stats, x)
                               .astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, 0.0)
        float(loop(params, stats, img))
        t0 = time.perf_counter()
        float(loop(params, stats, img))
        return (time.perf_counter() - t0) / iters

    def ev(keep=None):
        def f(params, stats, x):
            out = model.apply({"params": params, "batch_stats": stats}, x,
                              train=False, keep=keep)
            return out[0] if isinstance(out, tuple) else out
        return f

    def tr(keep=None):
        def f(params, stats, x):
            out, _ = model.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                keep=keep, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1),
                      "mixtoken": jax.random.PRNGKey(2)})
            return out[0]
        return f

    cases = {
        "eval fwd full": ev(),
        "train fwd full": tr(),
        "eval fwd no outlookers": ev((tuple([False] * L0),
                                      tuple([True] * L1))),
        "eval fwd no transformers": ev((tuple([True] * L0),
                                        tuple([False] * L1))),
        "eval fwd stem+post only": ev((tuple([False] * L0),
                                       tuple([False] * L1))),
    }
    print(f"B={B} iters={iters}", file=sys.stderr)
    for name, fn in cases.items():
        t = timeit(fn)
        print(f"{name:<28s} {t * 1e3:8.2f} ms  {B / t:7.0f} img/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
