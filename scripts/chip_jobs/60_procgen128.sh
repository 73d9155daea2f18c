#!/bin/bash
# RETRY content (attempt 1 ran the full 3-seed matrix and was backstop-
# SIGTERMed): salvage the seed-42 pair only. ab_procgen reuses arms
# completed by prior attempts, so this reuses the finished fixed arm,
# reruns (or reuses) the autoprog arm, summarizes, and exits — no
# further seeds. Graceful deadline 90 min > one autoprog arm @128px;
# backstop 3h so SIGTERM never hits a live TPU client.
set -u
exec timeout 10800 python scripts/ab_procgen.py --img-size 128 \
    --seeds 42 --deadline-ts $(($(date +%s) + 5400))
