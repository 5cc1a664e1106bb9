"""TPU compute ops: mel front-end, RoPE, attention, and Pallas kernels."""

from .stft import MelFrontend, mel_filterbank
from .rope import rope_tables, apply_rope
from .attention import attention

__all__ = ["MelFrontend", "mel_filterbank", "rope_tables", "apply_rope", "attention"]
