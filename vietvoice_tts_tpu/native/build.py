"""Build the native audio DSP shared library.

Usage: ``python -m vietvoice_tts_tpu.native.build``
Produces ``libvvaudio.so`` next to this file; ``audio_native.py`` picks it up
automatically. Pure optimization — every caller has a numpy fallback.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SRC = HERE / "audio_kernels.cpp"
OUT = HERE / "libvvaudio.so"


def build(verbose: bool = True) -> bool:
    gxx = shutil.which("g++")
    if gxx is None:
        if verbose:
            print("g++ not found; skipping native build", file=sys.stderr)
        return False
    cmd = [
        gxx,
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(SRC),
        "-o",
        str(OUT),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        if verbose:
            print(f"native build failed:\n{e.stderr.decode()}", file=sys.stderr)
        return False
    if verbose:
        print(f"built {OUT}")
    return True


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
