"""Build the native host-runtime library (g++ -O3 -shared).

Usage: python -m dostransformer_tpu.native.build
The package also builds lazily on first import of dostransformer_tpu.native
when a compiler is present; without one, callers fall back to the NumPy
implementations behind the same call sites.
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "src", "dostpu_native.cc")
LIB = os.path.join(os.path.dirname(__file__), "libdostpu_native.so")


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", LIB]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
