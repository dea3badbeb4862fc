"""Multi-host bring-up validated with two coordinated CPU processes.

The reference is strictly single-process (SURVEY.md §2.2); the TPU
rebuild's multi-host story (jax.distributed over DCN + host-0 job
registry broadcast, SURVEY.md §5) is exercised here for real: two
OS processes × 4 virtual devices each form one 8-device global mesh,
run a cross-process collective, and replicate a job-registry update
from host 0 — the same code path as DCN-connected TPU hosts.
"""

import json
import pathlib
import socket
import subprocess
import sys


WORKER = pathlib.Path(__file__).with_name("_multihost_worker.py")
REPO = str(pathlib.Path(__file__).resolve().parents[1])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_and_registry_broadcast():
    coord = f"127.0.0.1:{_free_port()}"
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        assert o["devices"] == 8
        # sum(0..15) over the globally sharded array, every host agrees.
        assert o["psum_total"] == 120.0
        # host-0's job update arrived on both hosts.
        assert o["job"] == {
            "job_id": "abc-123",
            "status": "completed",
            "progress": 100,
        }
