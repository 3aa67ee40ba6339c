#!/usr/bin/env python
"""Per-model entry point mirroring the reference harness's run_transe.py
(SURVEY.md section 2.2): thin wrapper pinning --model transe."""
import sys
from skge_tpu.experiment import main

if __name__ == "__main__":
    sys.exit(main(["--model", "transe"] + sys.argv[1:]))
