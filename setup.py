"""Build script for the native runtime extension (see native/enviio.cpp).

The extension is optional: the package falls back to numpy/scipy paths
when it is absent. Build in place with:

    python setup.py build_ext --inplace
"""

from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension(
            "srcfinder_tpu._native",
            sources=["native/enviio.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
