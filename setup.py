"""Builds the native I/Q ring (native/iqring.cpp) as a C++ extension so a
pip-installed wheel carries the real-time transport without a source
checkout.  All metadata lives in pyproject.toml.

The "extension" is a plain C-ABI shared library consumed via ctypes
(galileo_sdr_sim_tpu/io/native_fifo.py) — it is never imported as a
Python module, so no PyInit symbol is needed.  The built file keeps the
full version+platform-tagged suffix; the ctypes loader resolves it via
importlib.util.find_spec on the module origin, so the filename never
needs to be predicted."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class BuildSharedLib(build_ext):
    """Skip the Python-extension import check: iqring is ctypes-loaded."""

    def get_export_symbols(self, ext):
        return ext.export_symbols  # don't require PyInit_*


setup(
    ext_modules=[
        Extension(
            "galileo_sdr_sim_tpu._iqring",
            sources=["native/iqring.cpp"],
            language="c++",
            extra_compile_args=["-O2", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
    cmdclass={"build_ext": BuildSharedLib},
)
