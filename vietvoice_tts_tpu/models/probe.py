"""Topology probe for the reference's ONNX graphs.

Round-1 verdict: the DiT's architecture assumptions (shared q/k RoPE tables,
packed QKV, depthwise+pointwise conv-pos) were never checked against the real
graphs, and no tool existed to do so. This probe reads each graph in the
reference tarball (``model-bin.pt``, layout at
``/root/reference/vietvoicetts/core/model.py:65-106``) with the dependency-free
reader in :mod:`onnx_pb` and reports exactly what the conversion needs:

- graph **inputs/outputs** with element types and (symbolic) shapes — checks
  the preprocess contract (noise, 4 rope tables, cond/uncond embeddings,
  ref_signal_len — reference ``core/tts_engine.py:228-230``);
- **op histogram** and per-initializer **consumers** with the attributes that
  decide layout: ``Gemm.transB``, ``Conv.group/kernel_shape`` — grouped vs
  depthwise convs and [out,in] vs [in,out] Linear weights;
- **orientation map** for 2-D initializers, consumed by
  ``convert.map_initializers_to_params`` so square weights are transposed by
  *consumer evidence* instead of shape guessing (round-1 advisor finding).

CLI::

    python -m vietvoice_tts_tpu.models.probe model-bin.pt [graph.onnx ...]
"""

from __future__ import annotations

import tarfile
from pathlib import Path
from typing import Dict, List, Optional

from .onnx_pb import OnnxGraph, OnnxModel, parse_model

__all__ = [
    "load_models_from_tarball",
    "initializer_orientations",
    "infer_architecture",
    "probe_graph",
    "probe_tarball",
]

_GRAPH_SUFFIX = ".onnx"


def load_models_from_tarball(tar_path) -> Dict[str, OnnxModel]:
    """Parse every ``*.onnx`` member of the tarball → {stem: OnnxModel}."""
    models: Dict[str, OnnxModel] = {}
    with tarfile.open(tar_path, "r") as tar:
        for member in tar.getmembers():
            if not (member.isfile() and member.name.endswith(_GRAPH_SUFFIX)):
                continue
            fh = tar.extractfile(member)
            if fh is None:
                continue
            stem = Path(member.name).stem
            models[stem] = parse_model(fh.read())
    return models


def initializer_orientations(graph: OnnxGraph) -> Dict[str, str]:
    """Layout of each 2-D weight from how the graph consumes it.

    Returns {initializer_name: "transpose" | "as_is"}:

    - ``Gemm`` input B with ``transB=1`` → stored [out, in] (torch Linear) →
      must be transposed into our [in, out] convention;
    - ``Gemm`` input B with ``transB=0`` and ``MatMul`` input B → already
      [in, out];
    - initializers consumed only by other ops are omitted (orientation is
      not a Gemm/MatMul question for them).

    Conflicting consumers (same tensor used both ways) are omitted too —
    the conversion then falls back to shape heuristics / explicit name_map.
    """
    votes: Dict[str, set] = {}
    for node in graph.nodes:
        if node.op_type == "Gemm" and len(node.inputs) >= 2:
            b = node.inputs[1]
            if b in graph.initializers:
                trans = bool(node.attrs.get("transB", 0))
                votes.setdefault(b, set()).add("transpose" if trans else "as_is")
            a = node.inputs[0]
            if a in graph.initializers and node.attrs.get("transA"):
                votes.setdefault(a, set()).add("transpose")
        elif node.op_type == "MatMul" and len(node.inputs) == 2:
            b = node.inputs[1]
            if b in graph.initializers and len(graph.initializers[b].dims) == 2:
                votes.setdefault(b, set()).add("as_is")
    return {name: v.pop() for name, v in votes.items() if len(v) == 1}


# ---------------------------------------------------------------------------
# Architecture-fact inference (round-2 verdict: derive head count / head_dim /
# mel params from graph EVIDENCE, never from config defaults — a perfect
# name-map conversion with the wrong head count still produces wrong audio,
# because head_dim decides the RoPE frequencies, ops/rope.py:20-33).
# ---------------------------------------------------------------------------


def _last_static_dim(vi) -> Optional[int]:
    if vi.shape:
        d = vi.shape[-1]
        if isinstance(d, int) and d > 0:
            return d
    return None


def _record(facts: Dict[str, dict], key: str, value: int, source: str) -> None:
    entry = facts.setdefault(key, {"votes": {}, "sources": []})
    entry["votes"][value] = entry["votes"].get(value, 0) + 1
    entry["sources"].append({"value": value, "from": source})


def _looks_like_window(a) -> bool:
    """Symmetric nonnegative taper peaking in the middle (hann-like)."""
    import numpy as np

    if a.ndim != 1 or a.size < 64 or a.dtype.kind != "f":
        return False
    if a.min() < -1e-6 or a.max() > 1.0 + 1e-6:
        return False
    # Symmetric about the midpoint; a *periodic* window (hann(N+1)[:-1])
    # drops the last sample, so compare excluding index 0.
    if not (
        np.allclose(a, a[::-1], atol=1e-4)
        or np.allclose(a[1:], a[1:][::-1], atol=1e-4)
    ):
        return False
    mid = a[a.size // 4 : -a.size // 4].mean()
    edge = (a[: a.size // 8].mean() + a[-a.size // 8 :].mean()) / 2
    return mid > 2 * edge


def infer_architecture(models: Dict[str, OnnxModel]) -> dict:
    """Extract model-architecture facts from the three reference graphs.

    Evidence map (reference I/O contract at
    ``/root/reference/vietvoicetts/core/tts_engine.py:228-230``):

    - **head_dim** — last static dim of the preprocess graph's four RoPE
      table outputs (``rope_cos_q``/``rope_sin_q``/``rope_cos_k``/
      ``rope_sin_k``); name-matched, with a fallback to any group of ≥4
      outputs sharing a trailing static dim.
    - **heads** — transformer ``Reshape`` nodes whose shape initializer is
      ``[..., heads, head_dim]`` (the pre-attention head split); derived
      ``dim // head_dim`` is cross-checked when both are known.
    - **dim** — modal length of the transformer graph's 1-D float
      initializers (LayerNorm scales/biases are all ``[dim]``).
    - **depth** — count of distinct layer indices among transformer
      initializer names (``...\\.N\\....``) in the largest pattern family.
    - **n_mels** — last static dim of the preprocess ``noise`` output /
      transformer ``noise`` input / decode mel input.
    - **vocab_size / text_dim** — the preprocess char-embedding table: the
      2-D initializer consumed as ``Gather`` data.
    - **n_fft** — a hann-like window initializer in the decode graph (iSTFT
      head), or ``ConvTranspose kernel_shape`` as weaker evidence.
    - **hop_length** — decode ``ConvTranspose`` strides (overlap-add step).

    Returns ``{"facts": {name: int}, "conflicts": {name: [votes...]},
    "evidence": {name: [{value, from}...]}}``. A fact with disagreeing
    evidence lands in ``conflicts`` and is ABSENT from ``facts`` — callers
    (``convert.py``) treat that, or a mismatch with an explicit config, as a
    hard error rather than silently shipping a default.
    """
    raw: Dict[str, dict] = {}

    pre = models.get("preprocess")
    if pre is not None:
        g = pre.graph
        rope_outs = [
            v
            for v in g.outputs
            if any(k in v.name.lower() for k in ("rope", "cos", "sin"))
        ]
        if len(rope_outs) < 4:
            # Fallback: a group of ≥4 outputs sharing one trailing static dim
            by_dim: Dict[int, int] = {}
            for v in g.outputs:
                d = _last_static_dim(v)
                if d:
                    by_dim[d] = by_dim.get(d, 0) + 1
            groups = [d for d, c in by_dim.items() if c >= 4]
            if len(groups) == 1:
                _record(raw, "head_dim", groups[0], "preprocess: 4-output shape group")
        for v in rope_outs:
            d = _last_static_dim(v)
            if d:
                _record(raw, "head_dim", d, f"preprocess output {v.name}")
        for v in g.outputs:
            if "noise" in v.name.lower():
                d = _last_static_dim(v)
                if d:
                    _record(raw, "n_mels", d, f"preprocess output {v.name}")
        # Text-embedding ConvNeXt stack depth: the preprocess graph's only
        # layer-indexed weight family.
        import re as _re2

        tfam: Dict[str, set] = {}
        for name in g.initializers:
            m = _re2.search(r"\.(\d+)\.", name)
            if m:
                tfam.setdefault(
                    name[: m.start()] + ".#." + name[m.end():], set()
                ).add(int(m.group(1)))
        tsizes = [
            len(idxs)
            for idxs in tfam.values()
            if len(idxs) >= 2 and idxs == set(range(len(idxs)))
        ]
        if tsizes:
            _record(
                raw, "text_conv_layers", max(tsizes),
                "preprocess: deepest layer-index family",
            )
        for node in g.nodes:
            if node.op_type == "Gather" and node.inputs:
                data = node.inputs[0]
                t = g.initializers.get(data)
                if t is not None and len(t.dims) == 2:
                    # Row count is the embedding-table size, which may be
                    # vocab_size or vocab_size+1 (filler row) depending on
                    # export convention — recorded as evidence, reconciled
                    # against vocab.txt by the converter.
                    _record(raw, "embedding_rows", t.dims[0], f"preprocess Gather {data}")
                    _record(raw, "text_dim", t.dims[1], f"preprocess Gather {data}")

    tr = models.get("transformer")
    if tr is not None:
        g = tr.graph
        for v in g.inputs:
            if "noise" in v.name.lower():
                d = _last_static_dim(v)
                if d:
                    _record(raw, "n_mels", d, f"transformer input {v.name}")
        # dim: modal 1-D float-initializer length (norm scales and biases).
        lengths: Dict[int, int] = {}
        for t in g.initializers.values():
            if len(t.dims) == 1 and t.data_type == 1 and t.dims[0] >= 64:
                lengths[t.dims[0]] = lengths.get(t.dims[0], 0) + 1
        if lengths:
            dim = max(lengths.items(), key=lambda kv: kv[1])[0]
            _record(raw, "dim", dim, f"transformer: modal 1-D initializer length ×{lengths[dim]}")
        # depth: layer-index families in initializer names.
        import re

        fam: Dict[str, set] = {}
        for name in g.initializers:
            m = re.search(r"\.(\d+)\.", name)
            if m:
                fam.setdefault(name[: m.start()] + ".#." + name[m.end():], set()).add(
                    int(m.group(1))
                )
        if fam:
            # The DiT trunk is the deepest contiguous 0..L-1 family in the
            # transformer graph (the only other indexed family is the small
            # text-conv stack). Singleton families are no evidence at all.
            sizes = [
                len(idxs)
                for idxs in fam.values()
                if len(idxs) >= 2 and idxs == set(range(len(idxs)))
            ]
            if sizes:
                _record(raw, "depth", max(sizes), "transformer: deepest layer-index family")
        # heads: Reshape to [..., heads, head_dim].
        head_dim_votes = raw.get("head_dim", {}).get("votes", {})
        hd = next(iter(head_dim_votes)) if len(head_dim_votes) == 1 else None
        for node in g.nodes:
            if node.op_type != "Reshape" or len(node.inputs) < 2:
                continue
            t = g.initializers.get(node.inputs[1])
            if t is None or t.array is None or t.array.ndim != 1 or t.array.size < 3:
                continue
            vals = [int(x) for x in t.array]
            if hd is not None and vals[-1] == hd and vals[-2] > 1:
                _record(raw, "heads", vals[-2], f"transformer Reshape {node.inputs[1]}")

    dec = models.get("decode")
    if dec is not None:
        g = dec.graph
        for v in g.inputs:
            low = v.name.lower()
            if "noise" in low or "mel" in low:
                d = _last_static_dim(v)
                if d and d > 1:
                    _record(raw, "n_mels", d, f"decode input {v.name}")
        # Vocoder trunk width: modal 1-D float-initializer length (norms,
        # biases, LayerScale gammas are all [dim]).
        vlen: Dict[int, int] = {}
        for t in g.initializers.values():
            if len(t.dims) == 1 and t.data_type == 1 and t.dims[0] >= 32:
                vlen[t.dims[0]] = vlen.get(t.dims[0], 0) + 1
        vdim = None
        if vlen:
            vdim = max(vlen.items(), key=lambda kv: kv[1])[0]
            _record(
                raw, "vocoder_dim", vdim,
                f"decode: modal 1-D initializer length ×{vlen[vdim]}",
            )
        # Trunk depth: deepest contiguous layer-index family.
        import re as _re

        vfam: Dict[str, set] = {}
        for name in g.initializers:
            m = _re.search(r"\.(\d+)\.", name)
            if m:
                vfam.setdefault(
                    name[: m.start()] + ".#." + name[m.end():], set()
                ).add(int(m.group(1)))
        vsizes = [
            len(idxs)
            for idxs in vfam.values()
            if len(idxs) >= 2 and idxs == set(range(len(idxs)))
        ]
        if vsizes:
            _record(raw, "vocoder_layers", max(vsizes), "decode: deepest layer-index family")
        # FFN width: the most common partner dim of [*, dim]/[dim, *] 2-D
        # weights (pw1/pw2 appear twice per layer; the head only once).
        if vdim is not None:
            partner: Dict[int, int] = {}
            for t in g.initializers.values():
                if len(t.dims) == 2 and vdim in t.dims:
                    other = t.dims[0] if t.dims[1] == vdim else t.dims[1]
                    if other != vdim:
                        partner[other] = partner.get(other, 0) + 1
            if partner:
                inter = max(partner.items(), key=lambda kv: kv[1])[0]
                _record(
                    raw, "vocoder_intermediate", inter,
                    f"decode: modal 2-D partner of dim ×{partner[inter]}",
                )
        for t in g.initializers.values():
            if t.array is not None and _looks_like_window(t.array):
                _record(raw, "n_fft", int(t.array.size), f"decode window {t.name}")
        for node in g.nodes:
            if node.op_type == "ConvTranspose":
                strides = node.attrs.get("strides")
                if strides:
                    _record(raw, "hop_length", int(strides[0]), "decode ConvTranspose strides")
                ks = node.attrs.get("kernel_shape")
                if ks and "n_fft" not in raw:
                    _record(raw, "n_fft", int(ks[0]), "decode ConvTranspose kernel_shape")

    facts: Dict[str, int] = {}
    conflicts: Dict[str, list] = {}
    for key, entry in raw.items():
        if len(entry["votes"]) == 1:
            facts[key] = next(iter(entry["votes"]))
        else:
            conflicts[key] = sorted(entry["votes"])
    # Derived heads = dim / head_dim; cross-checked against Reshape evidence.
    if "dim" in facts and "head_dim" in facts and facts["dim"] % facts["head_dim"] == 0:
        derived = facts["dim"] // facts["head_dim"]
        if "heads" in facts and facts["heads"] != derived:
            conflicts["heads"] = sorted({facts.pop("heads"), derived})
        elif "heads" not in facts and "heads" not in conflicts:
            facts["heads"] = derived
            _record(raw, "heads", derived, "derived: dim // head_dim")
    evidence = {k: v["sources"] for k, v in raw.items()}
    return {"facts": facts, "conflicts": conflicts, "evidence": evidence}


def _value_infos(infos) -> List[dict]:
    return [
        {"name": v.name, "elem_type": v.elem_type, "shape": v.shape} for v in infos
    ]


def probe_graph(model: OnnxModel) -> dict:
    """Structural summary of one graph (JSON-serializable)."""
    g = model.graph
    op_hist: Dict[str, int] = {}
    consumers: Dict[str, List[dict]] = {}
    conv_info: List[dict] = []
    for node in g.nodes:
        op_hist[node.op_type] = op_hist.get(node.op_type, 0) + 1
        for pos, inp in enumerate(node.inputs):
            if inp not in g.initializers:
                continue
            entry = {"op": node.op_type, "arg": pos}
            for key in ("transA", "transB", "group", "kernel_shape", "strides", "axis"):
                if key in node.attrs:
                    entry[key] = node.attrs[key]
            consumers.setdefault(inp, []).append(entry)
        if node.op_type in ("Conv", "ConvTranspose") and len(node.inputs) >= 2:
            w = node.inputs[1]
            conv_info.append(
                {
                    "weight": w,
                    "op": node.op_type,
                    "group": node.attrs.get("group", 1),
                    "kernel_shape": node.attrs.get("kernel_shape"),
                    "weight_shape": list(g.initializers[w].dims)
                    if w in g.initializers
                    else None,
                }
            )
    return {
        "name": g.name,
        "ir_version": model.ir_version,
        "opset": model.opset,
        "inputs": _value_infos(g.inputs),
        "outputs": _value_infos(g.outputs),
        "num_nodes": len(g.nodes),
        "op_histogram": dict(sorted(op_hist.items(), key=lambda kv: -kv[1])),
        "initializers": [
            {"name": t.name, "dims": list(t.dims), "data_type": t.data_type}
            for t in g.initializers.values()
        ],
        "consumers": consumers,
        "convs": conv_info,
        "orientations": initializer_orientations(g),
    }


def probe_tarball(tar_path, graphs: Optional[List[str]] = None) -> dict:
    """Probe every (or the named) ONNX graphs in a reference tarball."""
    models = load_models_from_tarball(tar_path)
    if graphs:
        wanted = {Path(x).stem for x in graphs}
        models = {k: v for k, v in models.items() if k in wanted}
    report = {stem: probe_graph(m) for stem, m in sorted(models.items())}
    report["architecture"] = infer_architecture(models)
    return report


def main(argv: Optional[List[str]] = None) -> int:  # pragma: no cover — thin CLI
    import argparse
    import json
    import sys

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("tarball", help="reference model-bin.pt")
    ap.add_argument("graphs", nargs="*", help="optional graph names to probe")
    ap.add_argument("--out", default=None, help="write JSON here instead of stdout")
    args = ap.parse_args(argv)
    report = probe_tarball(args.tarball, args.graphs or None)
    text = json.dumps(report, indent=2, default=str)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        print(text)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
