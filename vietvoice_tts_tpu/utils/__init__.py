"""Utility subpackage: logging, WAV I/O, env helpers."""

from .logging import get_logger, logger
from .wavio import read_wav, write_wav, wav_bytes

__all__ = ["get_logger", "logger", "read_wav", "write_wav", "wav_bytes"]
