"""Serving: continuous micro-batching dispatcher for the TPU pipeline."""

from .batcher import ChunkJob, MicroBatcher

__all__ = ["ChunkJob", "MicroBatcher"]
