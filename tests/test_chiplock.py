"""Single-holder TPU registry (utils/chiplock.py).

The mechanism behind bench.py's exclusive-chip preflight: resident
servers register exact-pid files; bench enumerates and evicts them.
No reference analogue (single process, backend/app.py:753) — this is
rig-specific enforcement, so the tests exercise the registry contract
directly with real subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from image_to_pointcloud_tpu.utils import chiplock

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def registry(tmp_path, monkeypatch):
    d = tmp_path / "holders"
    monkeypatch.setattr(chiplock, "REGISTRY_DIR", d)
    monkeypatch.setenv("IPC_TPU_HOLDER_DIR", str(d))
    return d


def _spawn_holder(registry, role="test_holder"):
    """Subprocess that registers itself then sleeps until killed."""
    code = (
        "import time\n"
        "from image_to_pointcloud_tpu.utils import chiplock\n"
        f"chiplock.register_tpu_holder({role!r})\n"
        "print('ready', flush=True)\n"
        "time.sleep(120)\n"
    )
    env = dict(os.environ, IPC_TPU_HOLDER_DIR=str(registry))
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        env=env,
        text=True,
    )
    assert p.stdout.readline().strip() == "ready"
    return p


def test_register_list_evict_roundtrip(registry):
    p = _spawn_holder(registry)
    try:
        holders = chiplock.list_tpu_holders()
        assert [h.pid for h in holders] == [p.pid]
        assert holders[0].role == "test_holder"

        evicted = chiplock.evict_tpu_holders(timeout_s=10.0)
        assert [h.pid for h in evicted] == [p.pid]
        # Process actually died and its pidfile is gone.
        assert p.wait(timeout=10) is not None
        assert chiplock.list_tpu_holders() == []
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()


def test_stale_pidfile_pruned_not_killed(registry):
    registry.mkdir(parents=True)
    # A pid that existed once but is gone now: spawn-and-wait.
    p = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True,
        text=True,
        check=True,
    )
    dead_pid = int(p.stdout)
    (registry / f"{dead_pid}.json").write_text(
        json.dumps(
            {"pid": dead_pid, "role": "ghost", "marker": "python -c x",
             "started": time.time()}
        )
    )
    assert chiplock.list_tpu_holders() == []
    assert not (registry / f"{dead_pid}.json").exists()


def test_recycled_pid_marker_mismatch_is_pruned(registry):
    """A live pid whose cmdline differs from the registered marker must
    never be a kill target (pid recycling)."""
    p = _spawn_holder(registry)
    try:
        f = registry / f"{p.pid}.json"
        rec = json.loads(f.read_text())
        rec["marker"] = "some entirely different process cmdline"
        f.write_text(json.dumps(rec))
        assert chiplock.list_tpu_holders() == []
        assert not f.exists()
        assert p.poll() is None  # untouched, still alive
    finally:
        p.kill()
        p.wait()


def test_evict_excludes_self(registry):
    chiplock.register_tpu_holder("self_test")
    try:
        assert chiplock.evict_tpu_holders() == []
        # Still registered (we only excluded, not deregistered).
        assert [h.pid for h in chiplock.list_tpu_holders()] == [os.getpid()]
    finally:
        chiplock.deregister_tpu_holder()


def test_corrupt_pidfile_pruned(registry):
    registry.mkdir(parents=True)
    (registry / "notanint.json").write_text("{")
    assert chiplock.list_tpu_holders() == []
    assert list(registry.glob("*.json")) == []


def test_serve_entrypoint_registers(registry):
    """The v1 server process registers a holder file while alive."""
    env = dict(os.environ, IPC_TPU_HOLDER_DIR=str(registry))
    # Drop the axon TPU plugin from the child's PYTHONPATH: the server
    # must come up on CPU (fast, and it must not contend for the
    # single-holder chip mid-suite). The in-repo package path replaces
    # it so `-m image_to_pointcloud_tpu.serve` resolves.
    env["PYTHONPATH"] = REPO
    p = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "image_to_pointcloud_tpu.serve",
            "--generation",
            "v1",
            "--port",
            "0",
        ],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(h.pid == p.pid for h in chiplock.list_tpu_holders()):
                break
            if p.poll() is not None:
                pytest.fail(f"server exited early rc={p.returncode}")
            time.sleep(0.3)
        else:
            pytest.fail("server never registered a TPU holder file")
    finally:
        p.terminate()
        p.wait(timeout=15)
