#!/usr/bin/env python3
"""Training entry point. See matryodshka_tpu/cli/train.py."""
from matryodshka_tpu.cli.train import main

if __name__ == "__main__":
    main()
