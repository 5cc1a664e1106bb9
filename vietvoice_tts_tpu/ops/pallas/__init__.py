"""Pallas TPU kernels for the hot ops (flash attention, mel, iSTFT).

Every kernel has an XLA twin in ``ops/`` used for correctness tests and as
the off-TPU fallback.
"""
