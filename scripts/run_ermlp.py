#!/usr/bin/env python
"""Per-model entry point mirroring the reference harness's run_ermlp.py
(SURVEY.md section 2.2): thin wrapper pinning --model ermlp."""
import sys
from skge_tpu.experiment import main

if __name__ == "__main__":
    sys.exit(main(["--model", "ermlp"] + sys.argv[1:]))
