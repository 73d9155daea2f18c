#!/bin/bash
# bf16 state-storage A/B: writes output/bench_r4_{f32state,emabf16,emabf16_mubf16}.json
# and (iff a bf16 config wins >=1%) output/bench_autotune.json adopted by bench.py.
set -u
# budget: the r4 attempt spanned ~28 min (log 02:53->03:21) incl. cold init;
# 3600 leaves ~2 cold-inits of headroom so the SIGTERM backstop never fires
# on a live TPU client (ADVICE r4)
exec timeout 3600 python scripts/ab_bf16_state.py
