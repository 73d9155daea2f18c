#!/usr/bin/env python
"""On-chip A/B of bf16 state storage (EMA trees, optionally Adam mu).

Attacks the opt+4xEMA roofline segment (PERF.md: ~20.75 ms, 1.3x over
its pure-bandwidth floor — four f32 param-sized HBM sweeps per step) by
storing the EMA trees (AUTOPROG_BENCH_EMA_BF16=1) and Adam's first
moment (AUTOPROG_BENCH_MU_BF16=1) in bf16, halving those sweeps'
traffic. Numerics are gated by tests/test_steps.py::test_ema_bf16_sr_parity
and test_adam_mu_bf16_close (stochastic-rounding EMA accumulation).

Runs the headline bench (bench.py) three times:
  f32state          — both knobs explicitly 0 (baseline, autotune ignored)
  emabf16           — EMA trees bf16
  emabf16_mubf16    — EMA trees + Adam mu bf16

Each leg writes output/bench_r4_<tag>.json. If the best bf16 config
beats f32state by >= 1% img/s, writes output/bench_autotune.json so the
headline bench (bench.py:bf16_state_knobs) adopts the measured-best
config; otherwise the A/B is a measured rejection and no autotune file
is written (an existing one is removed so a stale win cannot linger).

Run ON the chip, single client at a time:
    python scripts/ab_bf16_state.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "output")

LEGS = [
    ("f32state", {"AUTOPROG_BENCH_EMA_BF16": "0",
                  "AUTOPROG_BENCH_MU_BF16": "0"}),
    ("emabf16", {"AUTOPROG_BENCH_EMA_BF16": "1",
                 "AUTOPROG_BENCH_MU_BF16": "0"}),
    ("emabf16_mubf16", {"AUTOPROG_BENCH_EMA_BF16": "1",
                        "AUTOPROG_BENCH_MU_BF16": "1"}),
]


def run_leg(tag: str, knobs: dict) -> dict | None:
    env = dict(os.environ)
    env.update(knobs)
    print(f"[ab_bf16_state] running leg {tag} {knobs}", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stderr.write(proc.stderr)
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    path = os.path.join(OUT, f"bench_r4_{tag}.json")
    with open(path, "w") as f:
        f.write(line + "\n")
    if proc.returncode != 0:
        print(f"[ab_bf16_state] leg {tag} FAILED rc={proc.returncode}: "
              f"{line}", flush=True)
        return None
    res = json.loads(line)
    print(f"[ab_bf16_state] leg {tag}: {res['value']} img/s "
          f"(vs_baseline {res['vs_baseline']})", flush=True)
    return res


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    # Quarantine any PRIOR autotune verdict before running legs: a leg
    # failure below returns early, and a stale win from an earlier run
    # must not survive to be silently adopted by 20_bench (ADVICE r4).
    stale = os.path.join(OUT, "bench_autotune.json")
    if os.path.exists(stale):
        os.replace(stale, stale + ".stale")
    results = {}
    for tag, knobs in LEGS:
        res = run_leg(tag, knobs)
        if res is None:
            return 1
        results[tag] = res["value"]

    base = results["f32state"]
    best_tag = max(results, key=results.get)
    autotune = os.path.join(OUT, "bench_autotune.json")
    if best_tag != "f32state" and results[best_tag] >= base * 1.01:
        cfg = {"ema_bf16": True,
               "mu_bf16": best_tag == "emabf16_mubf16",
               "legs_img_per_s": results}
        with open(autotune, "w") as f:
            json.dump(cfg, f, indent=1)
        print(f"[ab_bf16_state] WIN: {best_tag} "
              f"{results[best_tag]:.1f} vs f32 {base:.1f} "
              f"(+{100 * (results[best_tag] / base - 1):.2f}%) -> "
              f"bench_autotune.json {cfg}", flush=True)
    else:
        if os.path.exists(autotune):
            os.remove(autotune)
        print(f"[ab_bf16_state] REJECTED: best {best_tag} "
              f"{results[best_tag]:.1f} vs f32 {base:.1f} "
              f"(<1% win); no autotune file", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
