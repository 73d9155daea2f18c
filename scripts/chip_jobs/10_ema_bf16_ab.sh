#!/bin/bash
# bf16 state-storage A/B: writes output/bench_r4_{f32state,emabf16,emabf16_mubf16}.json
# and (iff a bf16 config wins >=1%) output/bench_autotune.json adopted by bench.py.
set -u
exec timeout 2400 python scripts/ab_bf16_state.py
