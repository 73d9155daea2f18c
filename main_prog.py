#!/usr/bin/env python
"""Entry point: progressive / AutoProg trainer (see autoprog_tpu/main_prog.py)."""
import sys

from autoprog_tpu.main_prog import main

if __name__ == "__main__":
    main(sys.argv[1:])
