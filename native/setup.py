"""Build the gs_native host extension:

    cd native && python setup.py build_ext --inplace

The .so lands next to this file; gaussian_splatting_tpu.utils.native adds
this directory to the import path and falls back to pure Python/JAX when
the extension has not been built.
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="gs_native",
    version="0.1",
    ext_modules=[
        Extension(
            "gs_native",
            sources=["gs_native.cc"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
