"""Build the native (C++) runtime components.

    python setup.py build_ext --inplace

Produces ``sglang_fluentllm_tpu/_radix_cpp*.so`` (CPython C API — no
pybind11 in the image). The pure-python implementations remain as
fallbacks; RadixCache picks the native core automatically when present.
"""

from setuptools import Extension, setup

setup(
    name="sglang_fluentllm_tpu_native",
    ext_modules=[
        Extension(
            "sglang_fluentllm_tpu._radix_cpp",
            sources=["csrc/radix_tree.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        ),
    ],
)
