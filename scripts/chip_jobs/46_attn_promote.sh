#!/bin/bash
# e2e confirmation of the promoted two-phase/bf16-score MHSA forward:
# headline bench (full fused train step) + kernel micro with the new default.
set -u
timeout 1800 python bench.py || exit 1
exec timeout 1200 python scripts/bench_attn.py 128
