"""Native (C++) host-side runtime components, bound via ctypes.

The reference's native layer is ONNX Runtime itself (SURVEY §2); our device
compute is XLA/Pallas, and this package covers the *host* hot paths around it:
audio DSP (cross-fade concatenation, normalization, resampling) used by the
serving loop. Python fallbacks exist for every function; the shared library is
built on demand by ``build.py``.
"""
