"""Build the framepack CPython extension: python native/setup.py build_ext --inplace
(or use scripts/build_native.sh, which drops the .so next to truely_tpu/media/)."""

from setuptools import Extension, setup

import os

exts = [
    Extension(
        "framepack",
        sources=["framepack.cpp"],
        extra_compile_args=["-O3", "-march=native", "-std=c++17", "-Wall"],
    )
]

# videodec needs the system libav* dev headers/libs; build it only where
# they exist (truely_tpu.media.native falls back to cv2 decode otherwise).
if os.path.exists("/usr/include/x86_64-linux-gnu/libavcodec/avcodec.h") or \
        os.path.exists("/usr/include/libavcodec/avcodec.h"):
    exts.append(
        Extension(
            "videodec",
            sources=["videodec.cpp"],
            libraries=["avformat", "avcodec", "avutil"],
            extra_compile_args=["-O3", "-march=native", "-std=c++17", "-Wall"],
        )
    )
    exts.append(
        Extension(
            "videoenc",
            sources=["videoenc.cpp"],
            libraries=["avformat", "avcodec", "avutil", "swscale"],
            extra_compile_args=["-O3", "-march=native", "-std=c++17", "-Wall"],
        )
    )

setup(
    name="framepack",
    version="0.1.0",
    ext_modules=exts,
)
