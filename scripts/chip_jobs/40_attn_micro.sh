#!/bin/bash
# where the transformer stack's 1.5x roofline headroom lives.
set -u
exec timeout 3600 python scripts/bench_attn.py  # budget incl. ~470s cold init; SIGTERM mid-run risks a tunnel wedge, so headroom is generous
