#!/usr/bin/env python
"""Per-model entry point mirroring the reference harness's run_hole.py
(SURVEY.md section 2.2): thin wrapper pinning --model hole."""
import sys
from skge_tpu.experiment import main

if __name__ == "__main__":
    sys.exit(main(["--model", "hole"] + sys.argv[1:]))
