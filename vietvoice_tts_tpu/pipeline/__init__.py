"""Host-side pipeline: text processing, audio DSP, synthesis orchestration."""

from .text import TextProcessor
from .audio import AudioProcessor

__all__ = ["TextProcessor", "AudioProcessor"]
