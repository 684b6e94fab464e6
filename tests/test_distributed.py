"""Genuine multi-process jax.distributed exercise (SURVEY §2.4/§4).

Launches tests/distributed_worker.py as TWO separate processes joined via
jax.distributed (coordinator on a free localhost port), each owning 4
virtual CPU devices — a real 2-host × 4-device topology as far as the JAX
runtime is concerned.  Both the shard_map path (estimate_sharded over an
8-device 'pixels' axis spanning the processes) and the GSPMD path
(estimate_pairs_batched over a (2, 4) mesh) must produce the same motion
estimate on every process and recover the rendered ground truth.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_REPO = os.path.dirname(_HERE)

V_TRUE = np.array([0.12, -0.05, 0.08])


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_estimation():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The workers set their own XLA_FLAGS (4 devices each); scrub the
    # 8-device flag this test process inherited from conftest.
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "distributed_worker.py"),
             coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}")
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"worker {pid} printed no RESULT:\n{out[-4000:]}"
        results[pid] = json.loads(lines[-1][len("RESULT "):])

    r0, r1 = results[0], results[1]
    # Replicated outputs must be IDENTICAL across processes (same program,
    # same collectives — any divergence means a broken replication).
    np.testing.assert_array_equal(r0["sharded_v"], r1["sharded_v"])
    np.testing.assert_array_equal(r0["sharded_w"], r1["sharded_w"])
    assert r0["sharded_num"] == r1["sharded_num"]
    np.testing.assert_array_equal(r0["batched_v"], r1["batched_v"])

    # And both paths must recover the rendered motion direction.
    for v in (np.asarray(r0["sharded_v"]),
              np.asarray(r0["batched_v"])[0],
              np.asarray(r0["batched_v"])[1]):
        ang = np.arccos(np.clip(
            v @ V_TRUE / (np.linalg.norm(v) * np.linalg.norm(V_TRUE)),
            -1, 1))
        assert ang < 0.05, (v, ang)
    assert r0["sharded_num"] > 0.4 * 64 * 64
