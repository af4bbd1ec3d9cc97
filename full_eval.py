#!/usr/bin/env python
"""Root wrapper: same entrypoint name as the reference full_eval.py."""
from gaussian_splatting_tpu.cli.full_eval import main

if __name__ == "__main__":
    main()
