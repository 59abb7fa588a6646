#!/usr/bin/env python3
"""Inference entry point. See matryodshka_tpu/cli/test.py."""
from matryodshka_tpu.cli.test import main

if __name__ == "__main__":
    main()
