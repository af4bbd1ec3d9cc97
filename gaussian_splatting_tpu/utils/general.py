"""General utilities: deterministic seeding, timestamped stdout, fs helpers.

Port of utils/general_utils.py:152-173 and utils/system_utils.py.
"""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool = False, seed: int = 0):
    """Seed RNGs and wrap stdout with timestamps (general_utils.py:152-173)."""
    old_f = sys.stdout

    class F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    ts = datetime.now().strftime("%d/%m %H:%M:%S")
                    old_f.write(x.replace("\n", f" [{ts}]\n"))
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F(silent)
    random.seed(seed)
    np.random.seed(seed)


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str) -> int:
    return max(int(fname.split("_")[-1]) for fname in os.listdir(folder))


def enable_compilation_cache(cache_dir: str | None = None):
    """Enable JAX's persistent compilation cache.

    The multi-operand lax.sort in the Pallas render path takes minutes to
    compile at scene scale; shapes are bucketed, so each bucket compiles
    exactly once ever with the cache on. Called by the CLIs and bench.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GS_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/gs_tpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
