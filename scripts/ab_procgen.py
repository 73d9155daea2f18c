#!/usr/bin/env python
"""Accuracy A/B at non-toy scale: AutoProg vs fixed on the procgen
benchmark (data/procgen.py — deterministic hard shape-composition
classification; the strongest accuracy testbed this offline environment
allows beyond sklearn's 8x8 digits).

Protocol mirrors scripts/real_data_digits.py: the SAME model, data and
epoch budget trained (a) fixed full-size via main.py and (b)
progressively with AutoProg via main_prog.py; compares best held-out
top-1 and train wall time, averaged over seeds. Reference claim under
test: `/root/reference/README.md:13-16` ("no performance drop").

Usage:
    python scripts/ab_procgen.py                  # on the chip
    JAX_PLATFORMS=cpu python scripts/ab_procgen.py --epochs 4 \
        --train-size 512 --num-classes 10 --img-size 64 -b 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def common_flags(a, seed: int) -> list:
    import jax
    flags = [
        "--num-classes", str(a.num_classes), "--img-size", str(a.img_size),
        "-b", str(a.batch), "--fake-data-size", str(a.train_size),
        "--lr", "1e-3", "--warmup-epochs", "2", "--cooldown-epochs", "0",
        "--sched", "cosine", "--min-lr", "1e-5", "--weight-decay", "0.05",
        "--scale", "0.6", "1.0", "--workers", str(a.workers),
        "--seed", str(seed), "--smoothing", "0.1", "--drop-path", "0.1",
        "--aa", "rand-m9-mstd0.5-inc1", "--remode", "pixel", "--reprob",
        "0.25",
        "--model-ema", "--model-ema-decay", "0.9", "0.95", "0.99", "0.995",
    ]
    if jax.devices()[0].platform == "cpu":
        flags += ["--no-bf16"]
    else:
        flags += ["--uint8-pipe"]
    return flags


def _train_time(out: str) -> float:
    import glob
    import re
    logs = sorted(glob.glob(os.path.join(out, "train", "*", "log.txt")))
    if not logs:
        return float("nan")
    with open(logs[-1]) as f:
        m = re.findall(r"total train time: ([0-9.]+)s", f.read())
    return float(m[-1]) if m else float("nan")


def _completed_result(out: str):
    """(best_top1, train_s) from a PRIOR completed run in `out`, else None.

    Both trainers log '*** Best metric:' then 'total train time:' only
    after the final epoch (main.py:102-104, main_prog.py:313-315), so a
    log carrying both lines is a finished arm and the values are exactly
    what run_fixed/run_autoprog would have returned. A run hard-killed
    mid-way (e.g. a chip-job timeout backstop) lacks them and is re-run.
    This makes retry attempts incremental: completed arms from earlier
    attempts are reused, never re-trained.
    """
    import glob
    import re
    logs = sorted(glob.glob(os.path.join(out, "train", "*", "log.txt")))
    if not logs:
        return None
    with open(logs[-1]) as f:
        text = f.read()
    best = re.findall(r"\*\*\* Best metric: ([0-9.]+)", text)
    tsec = re.findall(r"total train time: ([0-9.]+)s", text)
    if not best or not tsec:
        return None
    return float(best[-1]), float(tsec[-1])


def run_fixed(a, out: str, seed: int):
    from autoprog_tpu.main import main
    best = main(["procgen://", "--model", a.model,
                 "--epochs", str(a.epochs), "--output", out]
                + common_flags(a, seed))
    return best, _train_time(out)


def run_autoprog(a, out: str, seed: int):
    from autoprog_tpu.main_prog import main
    best = main(["procgen://", "--model", a.model,
                 "--epochs", str(a.epochs), "--output", out,
                 "--num-stages", str(a.stages), "--r-scale", "0.5",
                 "--l-scale", "0.5", "--auto-grow",
                 "--search-epochs", "1", "--search-probe-steps", "2",
                 "--load-with-clone-ema"] + common_flags(a, seed))
    return best, _train_time(out)


def main() -> None:
    # must run before the first jax touch (common_flags calls
    # jax.devices()): the TPU plugin ignores the raw JAX_PLATFORMS env
    # var, so without this a CPU-intended run initializes the TPU client
    from autoprog_tpu.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--model", default="volo_h4_l8")
    p.add_argument("--num-classes", type=int, default=100)
    p.add_argument("--img-size", type=int, default=128)
    p.add_argument("--train-size", type=int, default=16000,
                   help="val split is train_size // 4 (engine.py)")
    p.add_argument("-b", "--batch", type=int, default=128)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--stages", type=int, default=3)
    p.add_argument("--seeds", type=int, nargs="+", default=[42, 7, 123])
    p.add_argument("--root", default=os.path.join(
        os.path.dirname(__file__), "..", "output", "procgen_runs"))
    p.add_argument("--deadline-ts", type=float, default=0.0,
                   help="unix timestamp: start no new ARM past this "
                        "(graceful stop — NEVER kill a running TPU client; "
                        "completed pairs are summarized; arms already "
                        "completed by prior attempts are reused for free)")
    p.add_argument("--summarize-only", action="store_true",
                   help="no training (no jax touch): parse whatever "
                        "completed arm pairs exist under --root and print "
                        "the summary table — salvages evidence from a run "
                        "the timeout backstop killed")
    a = p.parse_args()

    rows = []
    stopped = False
    for seed in a.seeds:
        if stopped:
            break
        t0 = time.perf_counter()
        pair = []
        for label, runner in (("fixed", run_fixed),
                              ("autoprog", run_autoprog)):
            out = os.path.join(a.root, f"{label}_s{seed}")
            prior = _completed_result(out)
            if prior is not None:
                print(f"[reuse] {label} s{seed}: top1 {prior[0]:.2f} "
                      f"({prior[1]:.0f}s) from a prior completed run",
                      flush=True)
                pair.append(prior)
                continue
            if a.summarize_only:
                print(f"[summarize-only] {label} s{seed}: no completed "
                      "run; pair skipped", flush=True)
                break
            if a.deadline_ts and time.time() > a.deadline_ts:
                print(f"[deadline] stopping before {label} s{seed}: past "
                      f"--deadline-ts; {len(rows)} completed pair(s) "
                      "summarized", flush=True)
                stopped = True
                break
            pair.append(runner(a, out, seed))
        if len(pair) != 2:
            continue
        (fixed_top1, fixed_tr), (auto_top1, auto_tr) = pair
        rows.append((seed, fixed_top1, fixed_tr, auto_top1, auto_tr))
        print(f"[seed {seed}] fixed {fixed_top1:.2f} ({fixed_tr:.0f}s)  "
              f"autoprog {auto_top1:.2f} ({auto_tr:.0f}s)  "
              f"delta {auto_top1 - fixed_top1:+.2f}  "
              f"speedup {fixed_tr / max(auto_tr, 1e-9):.2f}x  "
              f"[pair wall {time.perf_counter() - t0:.0f}s]", flush=True)

    if not rows:
        # nonzero exit: the chip-queue runner marks rc==0 jobs .done
        # permanently — a zero-evidence run must stay retryable
        print("no completed seed pairs"
              + ("" if a.summarize_only
                 else " (deadline hit before the first)"))
        sys.exit(4)
    import numpy as np
    f = np.array([r[1] for r in rows], float)
    au = np.array([r[3] for r in rows], float)
    ft = np.array([r[2] for r in rows], float)
    at = np.array([r[4] for r in rows], float)
    print()
    print(f"model={a.model} epochs={a.epochs} seeds={a.seeds} "
          f"(procgen: {a.num_classes} classes, {a.train_size} train / "
          f"{a.train_size // 4} val @ {a.img_size}px)")
    print(f"{'run':<12s} {'top-1 mean+/-std':>18s} {'train s':>9s}")
    print(f"{'fixed':<12s} {f.mean():>9.2f} +/-{f.std():<5.2f} "
          f"{ft.mean():>9.1f}")
    print(f"{'autoprog':<12s} {au.mean():>9.2f} +/-{au.std():<5.2f} "
          f"{at.mean():>9.1f}")
    print(f"train-time speedup {ft.mean() / at.mean():.2f}x, "
          f"top-1 delta {au.mean() - f.mean():+.2f} "
          f"(per-seed deltas: {[round(x, 2) for x in (au - f).tolist()]})")


if __name__ == "__main__":
    main()
