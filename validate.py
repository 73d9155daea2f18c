#!/usr/bin/env python
"""Entry point: standalone evaluator (see autoprog_tpu/validate.py)."""
import sys

from autoprog_tpu.validate import main

if __name__ == "__main__":
    main(sys.argv[1:])
