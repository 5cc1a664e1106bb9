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
from typing import Any, Dict

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


# ---------------------------------------------------------------------------
# Initializer → parameter-pytree mapping
# ---------------------------------------------------------------------------


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    """{'blocks.qkv.w': leaf, ...} — dots for dicts, indices for lists."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out


def _set_leaf(tree, path: str, value: np.ndarray) -> None:
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    last = keys[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def _layer_index(name: str) -> tuple[str, int] | None:
    """Split 'blocks.3.qkv.weight' → ('blocks.#.qkv.weight', 3)."""
    import re

    m = re.search(r"\.(\d+)\.", name)
    if not m:
        return None
    return name[: m.start()] + ".#." + name[m.end() :], int(m.group(1))


def map_initializers_to_params(
    inits: Dict[str, np.ndarray],
    template,
    name_map: Dict[str, str] | None = None,
) -> tuple[Any, dict]:
    """Fill a parameter pytree from a flat {name: ndarray} initializer dict.

    ``template`` provides the target structure and shapes (e.g. from
    ``init_dit_params``). Resolution order per leaf:

    1. explicit ``name_map`` entry (leaf path → initializer name),
    2. unique exact-shape match among unused initializers,
    3. unique transposed 2-D match (ONNX/torch Linear weights are
       [out, in]; ours are [in, out]),
    4. for depth-stacked leaves [L, ...]: L same-shape (or transposed)
       initializers whose names differ only by a layer index — stacked in
       index order.

    Returns (params, report); ``report['unresolved']`` lists leaves the
    heuristics could not fill (left at template values) so callers can
    extend the name map instead of silently shipping mixed weights.
    """
    import copy

    params = copy.deepcopy(
        {k: v for k, v in template.items()} if isinstance(template, dict) else template
    )
    flat = _flatten(params)
    used: set[str] = set()
    resolved: Dict[str, str] = {}
    unresolved: list[str] = []

    # Pre-bucket initializers by shape, and by (layer-pattern) for stacking.
    by_shape: Dict[tuple, list[str]] = {}
    for n, a in inits.items():
        by_shape.setdefault(tuple(a.shape), []).append(n)
    stacks: Dict[tuple, Dict[int, str]] = {}
    for n, a in inits.items():
        li = _layer_index(n)
        if li is not None:
            pattern, idx = li
            stacks.setdefault((pattern, tuple(a.shape)), {})[idx] = n

    def take(name: str, path: str, value: np.ndarray) -> None:
        used.add(name)
        resolved[path] = name
        _set_leaf(params, path, value.astype(np.float32))

    for path, leaf in flat.items():
        shape = tuple(np.shape(leaf))
        # 1. explicit map
        if name_map and path in name_map:
            src = name_map[path]
            if src not in inits:
                unresolved.append(path)
                continue
            a = inits[src]
            if tuple(a.shape) == shape:
                take(src, path, a)
            elif a.ndim == 2 and tuple(a.T.shape) == shape:
                take(src, path, a.T)
            else:
                unresolved.append(path)
            continue
        # 2. unique exact-shape match
        cands = [n for n in by_shape.get(shape, []) if n not in used]
        if len(cands) == 1:
            take(cands[0], path, inits[cands[0]])
            continue
        # 3. unique transposed 2-D match
        if len(shape) == 2:
            t_cands = [
                n for n in by_shape.get((shape[1], shape[0]), []) if n not in used
            ]
            if not cands and len(t_cands) == 1:
                take(t_cands[0], path, inits[t_cands[0]].T)
                continue
        # 4. depth-stacked leaf: L per-layer tensors stacked on axis 0
        if len(shape) >= 2:
            depth, inner = shape[0], shape[1:]
            for (pattern, ishape), members in stacks.items():
                if len(members) != depth or not all(
                    i in members for i in range(depth)
                ):
                    continue
                transpose = False
                if ishape == inner:
                    pass
                elif len(inner) == 2 and ishape == (inner[1], inner[0]):
                    transpose = True
                else:
                    continue
                if any(members[i] in used for i in range(depth)):
                    continue
                arrs = [inits[members[i]] for i in range(depth)]
                if transpose:
                    arrs = [a.T for a in arrs]
                stacked = np.stack(arrs).astype(np.float32)
                for i in range(depth):
                    used.add(members[i])
                resolved[path] = f"{pattern} (stacked {depth})"
                _set_leaf(params, path, stacked)
                break
            else:
                unresolved.append(path)
                continue
            continue
        unresolved.append(path)

    report = {
        "resolved": resolved,
        "unresolved": unresolved,
        "unused_initializers": sorted(set(inits) - used),
    }
    if unresolved:
        log.warning(
            "Conversion left %d parameter leaves unresolved: %s",
            len(unresolved),
            unresolved[:10],
        )
    else:
        log.info("Mapped all %d parameter leaves from initializers", len(flat))
    return params, report


def convert_reference_tarball(
    tar_path: str | Path,
    pack_dir: str | Path,
    config=None,
    name_map: Dict[str, str] | None = None,
) -> dict:
    """Full conversion: reference ``model-bin.pt`` → TPU weight pack.

    Assets (vocab/catalog/audio) are always extracted; graph weights are
    mapped when the ``onnx`` package is available. Unresolved leaves keep
    their seeded-init values and are listed in the returned report —
    rerun with an extended ``name_map`` to pin them explicitly.

    Can be run directly::

        python -m vietvoice_tts_tpu.models.convert model-bin.pt packs/v1
    """
    import json

    from ..config import ModelConfig
    from .dit import DiTConfig, init_dit_params
    from .vocoder import VocoderConfig, init_vocoder_params

    cfg = config or ModelConfig()
    pack = Path(pack_dir)
    report: dict = {"assets": extract_assets(tar_path, pack)}

    vocab_size = cfg.vocab_size
    if report["assets"]["vocab"]:
        vocab_size = sum(
            1 for _ in (pack / "vocab.txt").read_text(encoding="utf-8").splitlines()
        )
    dit_cfg = DiTConfig(
        dim=cfg.dit_dim, depth=cfg.dit_depth, heads=cfg.dit_heads,
        ff_mult=cfg.dit_ff_mult, n_mels=cfg.n_mels, text_dim=cfg.text_dim,
        text_conv_layers=cfg.text_conv_layers, vocab_size=vocab_size,
    )
    voc_cfg = VocoderConfig(
        dim=cfg.vocoder_dim, intermediate_dim=cfg.vocoder_intermediate_dim,
        num_layers=cfg.vocoder_num_layers, n_mels=cfg.n_mels, n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
    )
    template = {
        "dit": init_dit_params(cfg.random_seed, dit_cfg),
        "vocoder": init_vocoder_params(cfg.random_seed + 1, voc_cfg),
    }
    try:
        graphs = load_onnx_initializers(tar_path)
    except RuntimeError as e:
        report["weights"] = {"skipped": str(e)}
        graphs = None
    if graphs is not None:
        merged = {
            f"{g}.{n}": a for g, inits in graphs.items() for n, a in inits.items()
        }
        template, weight_report = map_initializers_to_params(
            merged, template, name_map=name_map
        )
        report["weights"] = {
            "resolved": len(weight_report["resolved"]),
            "unresolved": weight_report["unresolved"],
            "unused_initializers": len(weight_report["unused_initializers"]),
        }

    from ..runtime.serialization import save_params

    save_params(pack / "params.msgpack", template)
    (pack / "model_meta.json").write_text(
        json.dumps(
            {
                "vocab_size": vocab_size,
                "dit": {
                    "dim": dit_cfg.dim, "depth": dit_cfg.depth,
                    "heads": dit_cfg.heads, "ff_mult": dit_cfg.ff_mult,
                    "text_dim": dit_cfg.text_dim,
                    "text_conv_layers": dit_cfg.text_conv_layers,
                },
                "vocoder": {
                    "dim": voc_cfg.dim,
                    "intermediate_dim": voc_cfg.intermediate_dim,
                    "num_layers": voc_cfg.num_layers,
                },
                "n_mels": cfg.n_mels, "n_fft": cfg.n_fft,
                "hop_length": cfg.hop_length, "sample_rate": cfg.sample_rate,
                "seed": cfg.random_seed, "converted_from": str(tar_path),
                # Honest marker: a pack is only non-synthetic when every
                # parameter leaf came from the reference's initializers.
                "synthetic": bool(
                    report["weights"].get("skipped")
                    or report["weights"].get("unresolved")
                ),
            },
            indent=2,
        )
    )
    log.info("Conversion report: %s", report)
    return report


if __name__ == "__main__":  # pragma: no cover — thin CLI
    import sys

    if len(sys.argv) != 3:
        print("usage: python -m vietvoice_tts_tpu.models.convert <model-bin.pt> <pack_dir>")
        raise SystemExit(2)
    convert_reference_tarball(sys.argv[1], sys.argv[2])
