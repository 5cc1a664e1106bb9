"""TPU runtime: weight store, compiled-program cache, engine core."""

from .session import ModelSessionManager
from .engine_core import EngineCore

__all__ = ["ModelSessionManager", "EngineCore"]
