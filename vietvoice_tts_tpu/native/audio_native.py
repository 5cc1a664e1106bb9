"""ctypes binding for the C++ audio DSP library (``libvvaudio.so``).

Falls back gracefully: ``available()`` returns False until the shared library
has been built (``python -m vietvoice_tts_tpu.native.build``), and callers in
``pipeline/audio.py`` keep their numpy paths.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libvvaudio.so"
_lib = None


def _load():
    global _lib
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vv_crossfade_concat.restype = ctypes.c_longlong
        lib.vv_crossfade_concat.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),  # waves
            ctypes.POINTER(ctypes.c_longlong),  # lengths
            ctypes.c_int,  # n_waves
            ctypes.c_int,  # crossfade samples
            ctypes.POINTER(ctypes.c_int16),  # out buffer
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def crossfade_concat(
    waves: list[np.ndarray], cross_fade_duration: float, sample_rate: int
) -> np.ndarray:
    """Equal-power RMS-matched cross-fade concat (C++ hot path)."""
    lib = _load()
    assert lib is not None
    waves = [np.ascontiguousarray(w, dtype=np.int16) for w in waves]
    n = len(waves)
    arr_type = ctypes.POINTER(ctypes.c_int16) * n
    ptrs = arr_type(*[w.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)) for w in waves])
    lens = (ctypes.c_longlong * n)(*[len(w) for w in waves])
    total = sum(len(w) for w in waves)
    out = np.zeros(total, np.int16)
    cf = int(cross_fade_duration * sample_rate)
    written = lib.vv_crossfade_concat(
        ptrs, lens, n, cf, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    )
    return out[:written]
