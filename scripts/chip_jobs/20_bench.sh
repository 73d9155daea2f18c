#!/bin/bash
# headline img/s recapture with the autotuned state config (round 3 lost it).
set -u
timeout 1200 python bench.py > output/bench_r4_chip.json
rc=$?
cat output/bench_r4_chip.json
exit $rc
