"""VietVoice TTS — TPU-native Vietnamese text-to-speech framework.

Top-level exports mirror the reference package root
(``/root/reference/vietvoicetts/__init__.py:5-22``).
"""

from .config import (
    MODEL_AREA,
    MODEL_EMOTION,
    MODEL_GENDER,
    MODEL_GROUP,
    ModelConfig,
    TTSConfig,
)
from .client import TTSApi, synthesize, synthesize_to_bytes
from .pipeline.engine import TTSEngine

__version__ = "0.1.0"

__all__ = [
    "ModelConfig",
    "TTSConfig",
    "TTSEngine",
    "TTSApi",
    "synthesize",
    "synthesize_to_bytes",
    "MODEL_GENDER",
    "MODEL_GROUP",
    "MODEL_AREA",
    "MODEL_EMOTION",
]
