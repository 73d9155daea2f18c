#!/bin/bash
# round-5 fwd-kernel restructure A/B (scripts/attn_variants.py): attack the
# transformer segment's 1.5x-above-floor via MXU/VPU pipelining (VERDICT r4 #4).
set -u
exec timeout 1800 python scripts/bench_attn.py 128
