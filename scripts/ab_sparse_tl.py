#!/usr/bin/env python
"""On-chip A/B of sparse token-label targets (AUTOPROG_SPARSE_TL).

Attacks the stem+post+heads+loss+opt roofline segment (PERF.md r5:
20.73 ms, 1.3x over its byte floor — and the dense-target construction
is IN that floor, so cutting it lowers the floor itself): the dense path
materializes a [B, C, 2+N] f32 target (~101 MB at the flagship shape)
through two full-C bilinear resize passes, only for the CE to contract
it against log-probabilities. The sparse path gathers K' log-probs per
token from the top-K store instead (data/token_label.py,
losses._sparse_aux_ce); numerics are equal by algebra and asserted by
tests/test_sparse_tl.py (loss + grads, every resize the schedule uses).

Runs the headline bench (bench.py) twice:
  densetl   — AUTOPROG_SPARSE_TL=0 (shipped default)
  sparsetl  — AUTOPROG_SPARSE_TL=1

Each leg writes output/bench_r5_<tag>.json. A >= 1% win is the
promotion bar (flip the default in train/steps.py); otherwise this is a
measured rejection. Run ON the chip, single client at a time:
    python scripts/ab_sparse_tl.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "output")

LEGS = [
    ("densetl", {"AUTOPROG_SPARSE_TL": "0"}),
    ("sparsetl", {"AUTOPROG_SPARSE_TL": "1"}),
]


def run_leg(tag: str, knobs: dict) -> dict | None:
    env = dict(os.environ)
    env.update(knobs)
    print(f"[ab_sparse_tl] running leg {tag} {knobs}", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stderr.write(proc.stderr)
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    with open(os.path.join(OUT, f"bench_r5_{tag}.json"), "w") as f:
        f.write(line + "\n")
    if proc.returncode != 0:
        print(f"[ab_sparse_tl] leg {tag} FAILED rc={proc.returncode}: "
              f"{line}", flush=True)
        return None
    res = json.loads(line)
    print(f"[ab_sparse_tl] leg {tag}: {res['value']} img/s "
          f"(vs_baseline {res['vs_baseline']})", flush=True)
    return res


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    results = {}
    for tag, knobs in LEGS:
        res = run_leg(tag, knobs)
        if res is None:
            return 1
        results[tag] = res["value"]
    base, sparse = results["densetl"], results["sparsetl"]
    rel = sparse / base - 1.0
    win = rel >= 0.01
    verdict = "WIN — promote sparse as default" if win else \
        "REJECTED (<1% or regression) — keep dense default"
    print(f"[ab_sparse_tl] dense {base:.1f} vs sparse {sparse:.1f} img/s "
          f"({rel * 100:+.2f}%): {verdict}", flush=True)
    # record the decision where bench.py adopts it (bf16_state_knobs reads
    # `sparse_tl` and sets AUTOPROG_SPARSE_TL for StepBuilder) — merged so
    # a bf16-state adoption written by job 10 is preserved
    autotune = os.path.join(OUT, "bench_autotune.json")
    tuned = {}
    if os.path.exists(autotune):
        try:
            with open(autotune) as f:
                tuned = json.load(f)
        except (ValueError, OSError):
            tuned = {}
    tuned["sparse_tl"] = bool(win)
    with open(autotune, "w") as f:
        json.dump(tuned, f)
    print(f"[ab_sparse_tl] bench_autotune.json <- {tuned}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
