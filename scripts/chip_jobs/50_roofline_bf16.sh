#!/bin/bash
# opt+EMA segment vs its new (bf16-state) smaller floor.
set -u
exec timeout 4800 python scripts/bench_roofline.py  # budget incl. ~470s cold init; generous to avoid SIGTERM on a live TPU client
