#!/usr/bin/env python
"""Entry point: fixed-schedule trainer (see autoprog_tpu/main.py)."""
import sys

from autoprog_tpu.main import main

if __name__ == "__main__":
    main(sys.argv[1:])
