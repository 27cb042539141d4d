from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension(
            "pocketsphinx_tpu.ps_native",
            sources=["native/ps_native.c"],
            extra_compile_args=["-O3", "-std=c11"],
            optional=True,   # pure-Python fallbacks exist
        ),
    ],
)
