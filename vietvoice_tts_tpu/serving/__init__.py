"""Serving: continuous micro-batching dispatcher for the TPU pipeline."""

from .batcher import ChunkJob, MicroBatcher
from .multihost import MultiHostServingLoop, ServingLoopStopped

__all__ = [
    "ChunkJob",
    "MicroBatcher",
    "MultiHostServingLoop",
    "ServingLoopStopped",
]
