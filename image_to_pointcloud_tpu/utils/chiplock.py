"""Single-holder TPU registry: make exclusive chip access a mechanism.

This rig's TPU is effectively single-holder (CLAUDE.md): a resident
serving process keeps the remote backend's graph-load path busy and any
OTHER process's compiles/loads stall indefinitely — BENCH_r04 recorded
a 378 s warmup stall on a fully warm cache because a serving sampler
was still up. Documentation ("kill every server before bench") failed
twice; this module is the enforcement:

- Every resident process that initializes the TPU backend registers
  itself (`register_tpu_holder`) as a JSON pidfile under
  ``/tmp/ipc_tpu_servers/`` and deregisters atexit.
- ``bench.py`` preflight calls :func:`evict_tpu_holders` to enumerate
  and kill the framework's OWN registered residents — by exact pid
  from the registry, never by pattern (no ``pkill -f``), and only
  after verifying the pid's ``/proc`` cmdline still matches the
  marker recorded at registration (a recycled pid is skipped and its
  stale file removed). The relay's processes (ports 8092/8113) never
  register here and are never touched.

The reference has no analogue (single process, CPU inference —
``backend/app.py:753``); this exists because the rebuild's serving and
bench processes genuinely contend for one chip.
"""

from __future__ import annotations

import atexit
import errno
import json
import os
import signal
import time
from dataclasses import dataclass
from pathlib import Path

__all__ = [
    "register_tpu_holder",
    "deregister_tpu_holder",
    "list_tpu_holders",
    "evict_tpu_holders",
    "REGISTRY_DIR",
]

REGISTRY_DIR = Path(
    os.environ.get("IPC_TPU_HOLDER_DIR", "/tmp/ipc_tpu_servers")
)


@dataclass
class Holder:
    pid: int
    role: str
    marker: str
    started: float
    path: Path


def _pid_cmdline(pid: int) -> str | None:
    """Space-joined /proc cmdline, or None if the pid is gone."""
    try:
        raw = Path(f"/proc/{pid}/cmdline").read_bytes()
    except OSError:
        return None
    return raw.replace(b"\x00", b" ").decode("utf-8", "replace").strip()


def register_tpu_holder(role: str) -> Path | None:
    """Record this process as a TPU holder; atexit-deregistered.

    ``role`` is a short label ("serve_v1", "serving_bench_server", …)
    surfaced in bench eviction logs. Returns the pidfile path, or None
    if the registry directory is unwritable (registration is advisory;
    a failure must never break the serving process itself).
    """
    pid = os.getpid()
    marker = _pid_cmdline(pid) or ""
    try:
        REGISTRY_DIR.mkdir(parents=True, exist_ok=True)
        path = REGISTRY_DIR / f"{pid}.json"
        path.write_text(
            json.dumps(
                {
                    "pid": pid,
                    "role": role,
                    "marker": marker,
                    "started": time.time(),
                }
            )
        )
    except OSError:
        return None
    atexit.register(deregister_tpu_holder, path, pid)
    return path


def deregister_tpu_holder(path: Path | None = None, pid: int | None = None) -> None:
    p = path or REGISTRY_DIR / f"{os.getpid()}.json"
    if pid is not None and pid != os.getpid():
        # atexit handler inherited across fork: not our registration.
        return
    try:
        p.unlink()
    except OSError:
        pass


def list_tpu_holders(*, prune: bool = True) -> list[Holder]:
    """Live registered holders; stale/recycled-pid files are pruned."""
    out: list[Holder] = []
    try:
        files = sorted(REGISTRY_DIR.glob("*.json"))
    except OSError:
        return out
    for f in files:
        try:
            rec = json.loads(f.read_text())
            pid = int(rec["pid"])
        except (OSError, ValueError, KeyError):
            if prune:
                f.unlink(missing_ok=True)
            continue
        cmd = _pid_cmdline(pid)
        # A dead pid, or a recycled pid whose cmdline no longer matches
        # the registered marker, is stale — never a kill target.
        if cmd is None or (rec.get("marker") and rec["marker"] != cmd):
            if prune:
                f.unlink(missing_ok=True)
            continue
        out.append(
            Holder(
                pid=pid,
                role=str(rec.get("role", "?")),
                marker=str(rec.get("marker", "")),
                started=float(rec.get("started", 0)),
                path=f,
            )
        )
    return out


def evict_tpu_holders(
    *, timeout_s: float = 8.0, exclude: set[int] | None = None
) -> list[Holder]:
    """SIGTERM (then SIGKILL) every registered holder except ourselves.

    Returns the holders that were signalled (for the caller's event
    log). Exact registered pids only — this can never touch the relay
    or anything that didn't opt in via :func:`register_tpu_holder`.
    """
    skip = {os.getpid(), os.getppid()} | (exclude or set())
    victims = [h for h in list_tpu_holders() if h.pid not in skip]
    for h in victims:
        try:
            os.kill(h.pid, signal.SIGTERM)
        except OSError as e:
            if e.errno == errno.ESRCH:
                h.path.unlink(missing_ok=True)
    deadline = time.time() + timeout_s
    remaining = list(victims)
    while remaining and time.time() < deadline:
        remaining = [h for h in remaining if _pid_cmdline(h.pid) is not None]
        if remaining:
            time.sleep(0.2)
    for h in remaining:
        try:
            os.kill(h.pid, signal.SIGKILL)
        except OSError:
            pass
    for h in victims:
        h.path.unlink(missing_ok=True)
    return victims
