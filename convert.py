#!/usr/bin/env python
"""Root wrapper: same entrypoint name as the reference convert.py."""
from gaussian_splatting_tpu.cli.convert import main

if __name__ == "__main__":
    main()
