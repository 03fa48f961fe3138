"""Build the native extensions in-place:  python native/setup.py build_ext --inplace

Outputs land in tpu_asr/utils/ so they import as tpu_asr.utils._editdistance.
"""

from setuptools import setup, Extension

setup(
    name="tpu_asr_native",
    ext_modules=[
        Extension(
            "tpu_asr.utils._editdistance",
            sources=["native/editdistance.c"],
            extra_compile_args=["-O3"],
        ),
        Extension(
            "tpu_asr.data._wavio",
            sources=["native/wavio.c"],
            extra_compile_args=["-O3"],
        ),
        Extension(
            "tpu_asr.data._flacio",
            sources=["native/flacio.c"],
            extra_compile_args=["-O3"],
        ),
    ],
)
