"""Parameter (de)serialization for the weight pack.

msgpack via ``flax.serialization`` — a single flat file, memory-mappable and
host-architecture independent, replacing the reference's ONNX-graph tarball
(``/root/reference/vietvoicetts/core/model.py:65-129``). Orbax checkpointing
for training lives in ``training/``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from flax import serialization


def save_params(path: str | Path, params) -> None:
    host_params = jax.tree.map(np.asarray, params)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.msgpack_serialize(host_params))


def load_params(path: str | Path):
    return serialization.msgpack_restore(Path(path).read_bytes())
