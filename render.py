#!/usr/bin/env python
"""Root wrapper: same entrypoint name as the reference render.py."""
from gaussian_splatting_tpu.cli.render import main

if __name__ == "__main__":
    main()
