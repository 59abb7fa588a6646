#!/usr/bin/env python3
"""Export entry point. See matryodshka_tpu/cli/export.py."""
from matryodshka_tpu.cli.export import main

if __name__ == "__main__":
    main()
