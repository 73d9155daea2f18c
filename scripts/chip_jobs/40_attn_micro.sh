#!/bin/bash
# where the transformer stack's 1.5x roofline headroom lives.
set -u
exec timeout 1800 python scripts/bench_attn.py
