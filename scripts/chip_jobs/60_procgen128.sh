#!/bin/bash
# the 128px non-toy procgen 3-seed leg. ab_procgen reuses arms completed
# by prior attempts and stops gracefully at --deadline-ts (never kill a
# running TPU client). Budget shape: graceful deadline at 2h; backstop at
# 4h — the 2h gap exceeds the longest single arm (fixed @30ep ~1.6h), so
# any arm STARTED before the deadline finishes before the backstop and
# the SIGTERM path never fires on a live TPU client.
set -u
exec timeout 14400 python scripts/ab_procgen.py --img-size 128 \
    --deadline-ts $(($(date +%s) + 7200))
