#!/bin/bash
# the 128px non-toy procgen 3-seed leg (ab_procgen has its own graceful deadline).
set -u
exec timeout 14400 python scripts/ab_procgen.py --img-size 128
