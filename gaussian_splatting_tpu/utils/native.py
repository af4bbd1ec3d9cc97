"""Loader for the optional gs_native host extension (native/gs_native.cc).

Mirrors the reference's native host components (simple-knn and the COLMAP
binary parse loops) on CPU. Everything has a pure Python/JAX fallback, so
the extension is an accelerator, never a requirement.
"""

from __future__ import annotations

import os
import sys

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_mod = None
_tried = False


def get_native():
    """Return the gs_native module or None if it is not built."""
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    if os.environ.get("GS_TPU_DISABLE_NATIVE"):
        return None
    if _NATIVE_DIR not in sys.path and os.path.isdir(_NATIVE_DIR):
        sys.path.append(_NATIVE_DIR)
    try:
        import gs_native  # noqa: F401

        _mod = gs_native
    except ImportError:
        _mod = None
    return _mod
