#!/usr/bin/env python
"""Benchmark: VOLO-D1 training throughput + progressive-schedule speedup.

Runs on whatever accelerator jax exposes (the real TPU chip under the
driver). Measures:
  1. img/s/chip of the full fused train step (fwd+bwd+AdamW+4xEMA, bf16,
     MixToken + token-label dense loss) for volo_d1 at 224 — the headline
     `value`;
  2. the wall-clock speedup of the AutoProg progressive stage schedule
     (stage configs from the flagship recipe: (128,9) (160,12) (192,15)
     (224,18), 25 epochs each) over training every epoch at full size —
     reported as `vs_baseline`. The reference claims "up to 85.1%
     training acceleration" for this mechanism (README.md:13-16); a
     vs_baseline of 1.67 corresponds to a 40% wall-clock cut
     (BASELINE.md north star).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bf16_state_knobs(args):
    """Parse the bf16 state-storage A/B env knobs shared by bench.py and
    scripts/bench_roofline.py: AUTOPROG_BENCH_EMA_BF16=1 stores EMA trees
    bf16 (returns the ema_dtype to pass to StepBuilder/TrainState), and
    AUTOPROG_BENCH_MU_BF16=1 sets args.adam_mu_bf16 for create_optimizer.

    With NEITHER env var set, falls back to `output/bench_autotune.json`
    when present — written by the on-chip A/B jobs
    (scripts/chip_jobs/10_ema_bf16_ab.sh, 42_sparse_tl.sh) iff a config
    beat the baseline by >=1%, so the headline bench reports the
    measured-best numerics-gated config (the A/B logs next to it prove
    the choice). The same file can carry `sparse_tl` (sparse token-label
    targets, data/token_label.py) — applied via the AUTOPROG_SPARSE_TL
    env StepBuilder reads, unless that env is already set."""
    import os
    import sys

    import jax.numpy as jnp

    tuned = {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "output", "bench_autotune.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                tuned = json.load(f)
        except (ValueError, OSError) as e:
            # a truncated/unreadable file must never break the bench's
            # one-JSON-line output contract — ignore it loudly
            print(f"# bench_autotune.json ignored (unreadable: {e})",
                  file=sys.stderr)
    ema = os.environ.get("AUTOPROG_BENCH_EMA_BF16")
    mu = os.environ.get("AUTOPROG_BENCH_MU_BF16")
    if tuned and ema is None and mu is None:
        ema = "1" if tuned.get("ema_bf16") else "0"
        mu = "1" if tuned.get("mu_bf16") else "0"
        print(f"# bench_autotune.json state config applied: {tuned}",
              file=sys.stderr)
    if tuned.get("sparse_tl") and "AUTOPROG_SPARSE_TL" not in os.environ:
        os.environ["AUTOPROG_SPARSE_TL"] = "1"
        print("# bench_autotune.json sparse_tl applied", file=sys.stderr)
    if mu == "1":
        args.adam_mu_bf16 = True
    return jnp.bfloat16 if ema == "1" else None


def time_step(step, state, batch, lr, rng, iters=10, warmup=None):
    """Time `iters` chained train steps as ONE jitted program (a fori_loop
    over the step), so per-dispatch host/tunnel latency cannot pollute the
    measurement. Returns (seconds_per_step, final_state)."""
    import jax

    @jax.jit
    def multi(state, batch, rng):
        def body(i, s):
            s2, _ = step(s, batch, lr, jax.random.fold_in(rng, i))
            return s2
        return jax.lax.fori_loop(0, iters, body, state)

    def sync(s):
        # a device->host readback of a value depending on the whole update:
        # through the axon tunnel, block_until_ready alone can return
        # before remote execution finishes
        return float(jax.tree.leaves(s.params)[0].sum())

    state = multi(state, batch, rng)  # compile + warm
    sync(state)
    t0 = time.perf_counter()
    state = multi(state, batch, rng)
    sync(state)
    return (time.perf_counter() - t0) / iters, state


def main():
    import argparse

    # Fail fast with one diagnosable JSON line instead of hanging when the
    # accelerator backend is unreachable (round-3 BENCH rc=124: two ~25 min
    # backend-init attempts against a dead TPU tunnel, then driver timeout).
    from autoprog_tpu.platform import apply_platform_env, ensure_backend_alive
    try:
        ensure_backend_alive()
    except RuntimeError as e:
        import sys
        print(json.dumps({
            "metric": "volo_d1_train_imgs_per_sec_per_chip",
            "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
            "error": str(e),
        }))
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    # routes JAX_PLATFORMS through jax.config (the TPU plugin ignores the
    # raw env var) and enables the persistent compile cache; on the
    # driver's TPU runs the env var is unset so behavior is unchanged
    apply_platform_env()

    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.prog.depth import elastic_keep_masks
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 8  # measured best img/s at b=128 on v5e
    args = argparse.Namespace(
        opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
        weight_decay=0.05, clip_grad=None, clip_mode="norm",
        token_label=True, token_label_data="synthetic", token_label_size=14,
        dense_weight=0.5, cls_weight=1.0, ground_truth=False, smoothing=0.1)

    mdef = create_model("volo_h12_l18")
    model = mdef.make(num_classes=1000, img_size=224, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mixtoken": jax.random.PRNGKey(2)},
        jnp.zeros((1, 224, 224, 3)), train=True))()
    ema_decays = (0.998, 0.9986, 0.999, 0.9996)
    # A/B knobs for the bf16 state-storage attack on the opt+EMA roofline
    # segment (PERF.md): halves the EMA sweeps' (and optionally Adam mu's)
    # HBM traffic. Env-off by default; once the on-chip A/B proves a >=1%
    # win it writes output/bench_autotune.json and the headline bench
    # adopts that config (a stderr line records every application).
    ema_dtype = bf16_state_knobs(args)
    tx = create_optimizer(args, variables["params"])
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     ema_decays=ema_decays, num_classes=1000,
                     token_label=True, has_token_label_data=True,
                     ema_dtype=ema_dtype)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx,
                              ema_decays=ema_decays, ema_dtype=ema_dtype)
    rs = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(rs.randn(batch, 224, 224, 3), jnp.bfloat16),
        "label": jnp.asarray(rs.randint(0, 1000, batch), jnp.int32),
        "label_scores": jnp.asarray(rs.rand(batch, 5, 14, 14), jnp.float32),
        "label_inds": jnp.asarray(rs.randint(0, 1000, (batch, 5, 14, 14)),
                                  jnp.int32),
    }
    rng = jax.random.PRNGKey(0)

    # full-size step: the img/s headline
    step_full = sb.train_step(r=224, splits=1)
    t_full, state = time_step(step_full, state, data, 1.6e-3, rng,
                              iters=20 if on_tpu else 2)
    imgs_per_sec = batch / t_full

    # progressive stage steps (flagship schedule stage configs)
    import sys
    stage_cfgs = [(128, 9), (160, 12), (192, 15), (224, 18)]
    l_max = 18
    times = []
    for r, l in stage_cfgs:
        keep = elastic_keep_masks(l, l, l_max) if l < l_max else None
        step = sb.train_step(r=r, keep=keep, splits=1)
        t, state = time_step(step, state, data, 1.6e-3, rng,
                             iters=20 if on_tpu else 1)
        times.append(t)
        print(f"# stage r={r} l={l}: {t * 1e3:.2f} ms/step "
              f"({batch / t:.0f} img/s)", file=sys.stderr)
    print(f"# full-size step: {t_full * 1e3:.2f} ms/step", file=sys.stderr)
    # equal stage lengths (25 epochs each): schedule cost vs full-size cost
    prog_cost = sum(times) / len(times)
    speedup = t_full / prog_cost

    print(json.dumps({
        "metric": "volo_d1_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
