"""Build the native host-runtime library with the system compiler."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

HERE = Path(__file__).parent


def build(verbose: bool = False) -> Path:
    src = HERE / "hostops.cc"
    out = HERE / "libflacxhost.so"
    cxx = shutil.which("c++") or shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        raise RuntimeError("no C++ compiler found")
    base = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
    # the library is always built on the machine it runs on (on-demand,
    # see flacx/native/__init__.py), so target the local ISA; fall back
    # to the portable build if the compiler rejects it
    for extra in (["-march=native"], []):
        cmd = base + extra + [str(src), "-o", str(out)]
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
            return out
        except subprocess.CalledProcessError:
            if not extra:
                raise
    return out


if __name__ == "__main__":
    print(build(verbose=True))
