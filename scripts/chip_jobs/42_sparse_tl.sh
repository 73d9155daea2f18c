#!/bin/bash
# round-5 sparse token-label target A/B (two headline-bench legs; each
# leg ~10 min warm + one cold init — 3600 keeps the SIGTERM backstop
# clear of any live run)
set -u
exec timeout 3600 python scripts/ab_sparse_tl.py
