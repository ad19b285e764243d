"""Build/packaging for sige-tpu.

The reference ships ``pip install sige`` with a compiled-extension build
matrix (reference: setup.py:34-144, torch cpp_extension + CUDA arches).
The TPU-native equivalent has exactly one native artifact — the host
planning library ``sige_tpu/native/planner.cpp`` (mask dilate/reduce +
scatter source maps, C ABI via ctypes) — compiled here at wheel-build
time so installed environments never pay the import-time build. The
import path keeps its lazy g++ build + numpy fallback for source
checkouts and toolchain-free machines (sige_tpu/native/__init__.py).
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithPlanner(build_py):
    """Compile the host-planner shared library into the build tree."""

    def run(self):
        super().run()
        src = os.path.join("sige_tpu", "native", "planner.cpp")
        out = os.path.join(self.build_lib, "sige_tpu", "native",
                           "_planner.so")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", out],
                check=True, capture_output=True, timeout=300)
        except Exception as exc:  # toolchain-free build hosts: wheel
            # still works — the numpy fallbacks cover every entry point
            print(f"[sige-tpu] planner build skipped ({exc!r}); "
                  "numpy fallbacks will be used")


setup(cmdclass={"build_py": BuildPyWithPlanner})
