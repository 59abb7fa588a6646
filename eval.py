#!/usr/bin/env python3
"""Evaluation entry point. See matryodshka_tpu/cli/evaluate.py."""
from matryodshka_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
