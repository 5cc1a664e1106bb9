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
    return {stem: probe_graph(m) for stem, m in sorted(models.items())}


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
