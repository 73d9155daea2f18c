#!/bin/bash
# opt+EMA segment vs its new (bf16-state) smaller floor.
set -u
exec timeout 2400 python scripts/bench_roofline.py
