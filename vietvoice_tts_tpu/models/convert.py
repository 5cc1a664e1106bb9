"""Convert the reference's model tarball into the TPU weight-pack layout.

The reference downloads ``model-bin.pt`` — a tar archive holding three ONNX
graphs plus assets (``/root/reference/vietvoicetts/core/model.py:65-129``:
``preprocess.onnx``, ``transformer.onnx``, ``decode.onnx``, ``vocab.txt``,
``audio_metadata.json``, ``cleaned_audios/*.wav``). Two conversion layers:

- :func:`extract_assets` — always available: pulls vocab, voice-catalog
  metadata, and reference clips into the pack directory
  (``runtime/session.py`` layout).
- :func:`load_onnx_initializers` — reads every graph initializer (weight
  tensor) by name so a name-map can populate the JAX parameter pytree.
  Requires the optional ``onnx`` package; raises a clear error otherwise
  (this image ships without it — the gate is tested).
"""

from __future__ import annotations

import tarfile
from pathlib import Path
from typing import Dict

import numpy as np

from ..utils.logging import get_logger

log = get_logger("convert")

_GRAPH_NAMES = ("preprocess.onnx", "transformer.onnx", "decode.onnx")


def extract_assets(tar_path: str | Path, pack_dir: str | Path) -> dict:
    """Extract vocab/metadata/reference audio from a reference tarball.

    Returns ``{"vocab": bool, "metadata": bool, "audios": int}`` describing
    what was found. Audio clips land in ``<pack_dir>/audios/`` (flattened),
    matching the weight-pack layout.
    """
    pack = Path(pack_dir)
    pack.mkdir(parents=True, exist_ok=True)
    (pack / "audios").mkdir(exist_ok=True)
    found = {"vocab": False, "metadata": False, "audios": 0}
    with tarfile.open(tar_path, "r") as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            name = Path(member.name).name
            data = tar.extractfile(member)
            if data is None:
                continue
            if name == "vocab.txt":
                (pack / "vocab.txt").write_bytes(data.read())
                found["vocab"] = True
            elif name == "audio_metadata.json":
                (pack / "audio_metadata.json").write_bytes(data.read())
                found["metadata"] = True
            elif name.endswith(".wav"):
                (pack / "audios" / name).write_bytes(data.read())
                found["audios"] += 1
    log.info(
        "Extracted assets from %s: vocab=%s metadata=%s audios=%d",
        tar_path,
        found["vocab"],
        found["metadata"],
        found["audios"],
    )
    return found


def load_onnx_initializers(
    tar_path: str | Path, graphs: tuple[str, ...] = _GRAPH_NAMES
) -> Dict[str, Dict[str, np.ndarray]]:
    """Read weight initializers from each ONNX graph in the tarball.

    Returns ``{graph_stem: {tensor_name: ndarray}}``. Raises RuntimeError
    when the optional ``onnx`` dependency is missing.
    """
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:  # pragma: no cover — exercised when absent
        raise RuntimeError(
            "Converting ONNX graph weights requires the optional 'onnx' "
            "package (asset extraction via extract_assets works without it)."
        ) from e

    out: Dict[str, Dict[str, np.ndarray]] = {}
    with tarfile.open(tar_path, "r") as tar:
        for member in tar.getmembers():
            name = Path(member.name).name
            if name not in graphs:
                continue
            fh = tar.extractfile(member)
            if fh is None:
                continue
            model = onnx.load_from_string(fh.read())
            out[Path(name).stem] = {
                init.name: numpy_helper.to_array(init)
                for init in model.graph.initializer
            }
            log.info(
                "Loaded %d initializers from %s", len(out[Path(name).stem]), name
            )
    return out
