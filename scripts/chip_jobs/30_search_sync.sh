#!/bin/bash
# measured de-sync search win (replaces PERF.md "by arithmetic" claim).
set -u
exec timeout 3600 python scripts/ab_search_sync.py
