#!/usr/bin/env python
"""Real-data accuracy signal: AutoProg vs fixed-budget training on real
handwritten digit images (sklearn load_digits — 1,797 genuine scans, 10
classes; the only real image corpus shipped in this environment).

Mirrors the reference's headline claim (`/root/reference/README.md:13-16`:
progressive learning cuts wall-clock with no accuracy drop) at the scale
the environment allows: the SAME model and epoch budget trained (a) fixed
full-size via main.py and (b) progressively with AutoProg via
main_prog.py, comparing best top-1 and wall time on a held-out split.

Usage:
    JAX_PLATFORMS=cpu python scripts/real_data_digits.py [--epochs N]

Writes the ImageFolder tree under output/digits_data/ (gitignored),
training runs under output/digits_runs/, and prints the comparison table.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def materialize(root: str) -> None:
    """sklearn digits -> ImageFolder tree (64px RGB PNGs, stratified 80/20)."""
    import numpy as np
    from PIL import Image
    from sklearn.datasets import load_digits

    if os.path.exists(os.path.join(root, "DONE")):
        return
    shutil.rmtree(root, ignore_errors=True)
    d = load_digits()
    images, labels = d.images, d.target  # [N, 8, 8] float 0..16
    counters = {}
    for i, (im, y) in enumerate(zip(images, labels)):
        k = counters.get(int(y), 0)
        counters[int(y)] = k + 1
        split = "val" if k % 5 == 4 else "train"  # stratified 80/20
        cls_dir = os.path.join(root, split, str(int(y)))
        os.makedirs(cls_dir, exist_ok=True)
        arr = np.clip(im * 255.0 / 16.0, 0, 255).astype(np.uint8)
        png = Image.fromarray(arr, mode="L").convert("RGB").resize(
            (64, 64), Image.NEAREST)
        png.save(os.path.join(cls_dir, f"{i}.png"))
    open(os.path.join(root, "DONE"), "w").close()


def common_flags(seed: int = 42) -> list:
    """Identical training config for both runs — incl. the reference
    recipe's 4-decay EMA list (scripts/train.sh uses EMA for the fixed
    baseline too, so leaving it off one side would skew accuracy)."""
    import jax
    flags = [
        "--num-classes", "10", "--img-size", "64", "-b", "64",
        "--lr", "1e-3", "--warmup-epochs", "1", "--cooldown-epochs", "0",
        "--sched", "cosine", "--min-lr", "1e-5", "--weight-decay", "0.05",
        "--scale", "0.6", "1.0", "--workers", "2", "--seed", str(seed),
        "--smoothing", "0.1",
        "--model-ema", "--model-ema-decay", "0.9", "0.95", "0.99", "0.995",
    ]
    if jax.devices()[0].platform == "cpu":
        flags += ["--no-bf16"]
    else:
        # uint8 H2D + in-step normalize: the tunnel moves ~27 MB/s, f32
        # batches would dominate wall time (PERF.md)
        flags += ["--uint8-pipe"]
    return flags


def _train_time(out: str) -> float:
    """Sum of train-epoch wall times from the run log (excludes eval,
    checkpointing, and between-run compile of eval programs; in-epoch
    compile stalls still count against the run that causes them)."""
    import glob
    import re
    logs = sorted(glob.glob(os.path.join(out, "train", "*", "log.txt")))
    if not logs:
        return float("nan")
    with open(logs[-1]) as f:
        m = re.findall(r"total train time: ([0-9.]+)s", f.read())
    return float(m[-1]) if m else float("nan")


def run_fixed(data: str, out: str, model: str, epochs: int, seed: int):
    from autoprog_tpu.main import main
    t0 = time.perf_counter()
    best = main([data, "--model", model, "--epochs", str(epochs),
                 "--output", out] + common_flags(seed))
    return best, time.perf_counter() - t0, _train_time(out)


def run_autoprog(data: str, out: str, model: str, epochs: int, seed: int):
    from autoprog_tpu.main_prog import main
    t0 = time.perf_counter()
    best = main([data, "--model", model, "--epochs", str(epochs),
                 "--output", out,
                 "--num-stages", "2", "--r-scale", "0.5",
                 "--l-scale", "0.5", "--auto-grow",
                 "--search-epochs", "1", "--search-probe-steps", "2",
                 "--load-with-clone-ema"] + common_flags(seed))
    return best, time.perf_counter() - t0, _train_time(out)


def main() -> None:
    # before the first jax touch: the TPU plugin ignores the raw
    # JAX_PLATFORMS env var (see autoprog_tpu/platform.py)
    from autoprog_tpu.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--model", default="volo_h2_l4")
    p.add_argument("--seeds", type=int, nargs="+", default=[42],
                   help="one full fixed-vs-autoprog A/B per seed; the "
                        "summary reports mean +/- std over seeds")
    p.add_argument("--root", default=os.path.join(
        os.path.dirname(__file__), "..", "output"))
    args = p.parse_args()

    data = os.path.join(args.root, "digits_data")
    runs = os.path.join(args.root, "digits_runs")
    materialize(data)

    rows = []
    for seed in args.seeds:
        fixed_top1, fixed_s, fixed_tr = run_fixed(
            data, os.path.join(runs, f"fixed_s{seed}"), args.model,
            args.epochs, seed)
        auto_top1, auto_s, auto_tr = run_autoprog(
            data, os.path.join(runs, f"autoprog_s{seed}"), args.model,
            args.epochs, seed)
        rows.append((seed, fixed_top1, fixed_tr, auto_top1, auto_tr))
        print(f"[seed {seed}] fixed {fixed_top1:.2f} ({fixed_tr:.0f}s)  "
              f"autoprog {auto_top1:.2f} ({auto_tr:.0f}s)  "
              f"delta {auto_top1 - fixed_top1:+.2f}  "
              f"speedup {fixed_tr / max(auto_tr, 1e-9):.2f}x", flush=True)

    import numpy as np
    f = np.array([r[1] for r in rows])
    a = np.array([r[3] for r in rows])
    ft = np.array([r[2] for r in rows])
    at = np.array([r[4] for r in rows])
    print()
    print(f"model={args.model} epochs={args.epochs} seeds={args.seeds} "
          f"(real data: sklearn digits, 1437 train / 360 val)")
    print(f"{'run':<12s} {'top-1 mean+/-std':>18s} {'train s':>9s}")
    print(f"{'fixed':<12s} {f.mean():>9.2f} +/-{f.std():<5.2f} "
          f"{ft.mean():>9.1f}")
    print(f"{'autoprog':<12s} {a.mean():>9.2f} +/-{a.std():<5.2f} "
          f"{at.mean():>9.1f}")
    print(f"train-time speedup {ft.mean() / at.mean():.2f}x, "
          f"top-1 delta {a.mean() - f.mean():+.2f} "
          f"(per-seed deltas: {[round(x, 2) for x in (a - f).tolist()]})")


if __name__ == "__main__":
    main()
