#!/usr/bin/env python
"""Per-segment MFU roofline of the volo_d1 train step (VERDICT r2 #9).

Decomposes the full fused AutoProg train step (fwd+bwd+AdamW+4xEMA,
token-label loss, b=128 @224) into segments by elastic keep-mask
ablation (the clean-difference method PERF.md already uses for timing)
and, for each segment, compares measured time against BOTH hardware
floors:

  * compute floor = XLA-counted FLOPs / peak bf16 (v5e ~197 TFLOP/s)
  * memory  floor = XLA-counted HBM bytes / peak BW (v5e ~819 GB/s)

FLOPs/bytes come from the compiled executable's own cost_analysis() —
not hand arithmetic — so the differencing is consistent with what the
chip actually runs. The binding floor per segment gives the verdict:
how much of the remaining time is provably inherent vs headroom.

Run ON the chip (single process, never killed):
  python scripts/bench_roofline.py [batch]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_BW = 819e9       # v5e HBM


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import time_step

    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 8)
    iters = 20 if on_tpu else 2
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
    # same bf16-state A/B knobs as bench.py (PERF.md round 4)
    from bench import bf16_state_knobs
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
    hw = 14
    data = {
        "image": jnp.asarray(rs.randn(batch, 224, 224, 3), jnp.bfloat16),
        "label": jnp.asarray(rs.randint(0, 1000, batch), jnp.int32),
        "label_scores": jnp.asarray(rs.rand(batch, 5, hw, hw), jnp.float32),
        "label_inds": jnp.asarray(rs.randint(0, 1000, (batch, 5, hw, hw)),
                                  jnp.int32),
    }
    rng = jax.random.PRNGKey(7)
    lr = 1e-3

    l0, l1 = 4, 14  # volo_d1 depth split (prog/depth.py volo_depth_split)

    def keep_mask(outlookers_on: bool, transformers_on: bool):
        return ((outlookers_on,) * l0, (transformers_on,) * l1)

    def measure(name, keep):
        step_fn = sb.train_step(r=224, keep=keep, splits=1)
        # AOT-compile to read cost analysis from the same executable
        lowered = step_fn.lower(state, data, lr, rng)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        t, _ = time_step(step_fn, state, dict(data), lr, rng, iters=iters)
        return {"name": name, "ms": t * 1e3, "flops": flops,
                "bytes": bytes_}

    rows = [
        measure("full", None),
        measure("no_outlookers", keep_mask(False, True)),
        measure("no_transformers", keep_mask(True, False)),
        measure("trunk_off", keep_mask(False, False)),
    ]
    by = {r["name"]: r for r in rows}

    def seg(name, hi, lo):
        return {"name": name,
                "ms": by[hi]["ms"] - by[lo]["ms"],
                "flops": by[hi]["flops"] - by[lo]["flops"],
                "bytes": by[hi]["bytes"] - by[lo]["bytes"]}

    segments = [
        seg("outlooker stage (x%d)" % l0, "full", "no_outlookers"),
        seg("transformer stack (x%d)" % l1, "full", "no_transformers"),
        dict(by["trunk_off"], name="stem+post+heads+loss+opt"),
        dict(by["full"], name="TOTAL full step"),
    ]

    print(f"\nb={batch} img=224 volo_h12_l18 train step "
          f"(fwd+bwd+adamw+4ema, token-label)")
    print(f"{'segment':<28}{'ms':>8}{'GFLOP':>9}{'GB':>8}"
          f"{'flop-floor':>11}{'mem-floor':>10}{'MFU%':>6}  verdict")
    for s in segments:
        if s["ms"] <= 0:
            continue
        f_floor = s["flops"] / PEAK_FLOPS * 1e3   # ms
        m_floor = s["bytes"] / PEAK_BW * 1e3      # ms
        mfu = 100.0 * f_floor / s["ms"]
        binding = max(f_floor, m_floor)
        head = s["ms"] / max(binding, 1e-9)
        verdict = ("compute-bound floor" if f_floor >= m_floor
                   else "memory-bound floor")
        verdict += f"; {head:.1f}x above it"
        print(f"{s['name']:<28}{s['ms']:8.2f}{s['flops'] / 1e9:9.1f}"
              f"{s['bytes'] / 1e9:8.2f}{f_floor:11.2f}{m_floor:10.2f}"
              f"{mfu:6.1f}  {verdict}")
    img_s = batch / (by["full"]["ms"] / 1e3)
    print(f"\nfull-step throughput: {img_s:.1f} img/s;  "
          f"model MFU {100.0 * by['full']['flops'] / PEAK_FLOPS / (by['full']['ms'] / 1e3):.1f}%")


if __name__ == "__main__":
    main()
