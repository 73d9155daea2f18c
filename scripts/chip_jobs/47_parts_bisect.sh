#!/bin/bash
# round-5 decomposition of the stem+post+heads+loss+opt segment (the
# remaining 1.3x-above-floor after the MHSA promotion): keep-mask ablation,
# token-label-loss bisect, optimizer+EMA isolation.
set -u
exec timeout 2400 python scripts/bench_parts.py --loss-bisect
