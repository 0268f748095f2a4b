"""2-process jax.distributed equivalence test (SURVEY §2.4/§5.8).

The reference's whole distributed story is single-process nn.DataParallel;
the rebuild's multi-host path is jax.distributed + per-host input feed
(parallel/mesh.local_batch_shard + make_array_from_process_local_data).
This test proves the path end-to-end ON CPU: two processes, 4 virtual
devices each, must produce the SAME training trajectory as one process
with 8 virtual devices — same pmean'd step metrics, same updated params.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(ndev: int, coord=None, nproc=None, pid=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in ("/root/.axon_site", REPO,
                    env.get("PYTHONPATH", "")) if p)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    if coord is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    steps = "2"
    # single-process, 8-device reference run
    ref_out = str(tmp_path / "ref.json")
    r = subprocess.run([sys.executable, WORKER, ref_out, steps],
                       env=_env(8), capture_output=True, text=True,
                       timeout=540)
    assert r.returncode == 0, r.stderr[-3000:]

    # 2 processes x 4 devices
    coord = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, outs[i], steps],
            env=_env(4, coord, 2, i),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    ref = json.load(open(ref_out))
    res = [json.load(open(o)) for o in outs]
    assert ref["ndev"] == 8 and ref["nproc"] == 1
    for rr in res:
        assert rr["ndev"] == 8 and rr["nproc"] == 2

    # both workers see identical (pmean'd) metrics
    np.testing.assert_allclose(res[0]["params_l1"], res[1]["params_l1"],
                               rtol=1e-6)
    # and the distributed trajectory matches the single-process one
    # (same 8-way sharding; only the collective topology differs)
    np.testing.assert_allclose(res[0]["metrics"]["loss"],
                               ref["metrics"]["loss"], rtol=1e-5)
    np.testing.assert_allclose(res[0]["params_l1"], ref["params_l1"],
                               rtol=1e-5)
