#!/bin/bash
# Salvage of the 128px procgen A/B (job 60 attempt 1 ran the full
# 3-seed matrix with a 4h backstop and was SIGTERMed mid-run): complete
# ONLY the seed-42 pair. ab_procgen reuses arms already completed by
# prior attempts (fixed s42 finished 13:00, top1 98.925), so this either
# summarizes instantly or reruns just the interrupted autoprog arm.
# Graceful deadline 90 min > one autoprog arm @128px; backstop 3h.
set -u
exec timeout 10800 python scripts/ab_procgen.py --img-size 128 \
    --seeds 42 --deadline-ts $(($(date +%s) + 5400))
