"""Build script for the native runtime pieces (see native/).

- srcfinder_tpu._native: C++ BIL repack + union-find labeling, imported
  as a Python extension. Optional: numpy fallbacks exist.
- srcfinder_tpu._alloccache: LD_PRELOAD large-allocation cache (never
  imported — utils.config.ensure_alloc_cache re-execs CLI processes
  with it preloaded). Built as an Extension for packaging convenience;
  it exports no PyInit symbol and must not be imported. Optional.

Build in place with:

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
        ),
        Extension(
            "srcfinder_tpu._alloccache",
            sources=["native/alloccache.cpp"],
            extra_compile_args=["-O2", "-std=c++17"],
            language="c++",
        ),
    ],
)
