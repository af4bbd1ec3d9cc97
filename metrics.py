#!/usr/bin/env python
"""Root wrapper: same entrypoint name as the reference metrics.py."""
from gaussian_splatting_tpu.cli.metrics import main

if __name__ == "__main__":
    main()
