#!/usr/bin/env python
"""Root wrapper: same entrypoint name as the reference train.py."""
from gaussian_splatting_tpu.cli.train import main

if __name__ == "__main__":
    main()
