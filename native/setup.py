"""Build the framepack CPython extension: python native/setup.py build_ext --inplace
(or use scripts/build_native.sh, which drops the .so next to truely_tpu/media/)."""

from setuptools import Extension, setup

setup(
    name="framepack",
    version="0.1.0",
    ext_modules=[
        Extension(
            "framepack",
            sources=["framepack.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
        )
    ],
)
