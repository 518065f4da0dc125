#!/usr/bin/env python
"""Terminal training launcher (reference: `/root/reference/run_train.py`)."""
import sys

from bbx.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
