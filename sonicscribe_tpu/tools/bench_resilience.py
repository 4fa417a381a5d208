"""Measurement-pipeline resilience for the official benchmark (bench.py).

Two consecutive rounds lost their driver-captured headline to the tunneled
device runtime (r3: output truncation; r4: a wedged epoch hanging the first
transfer), so the official bench now has to survive a sick epoch instead of
dying on it. This module is the importable, unit-testable core:

- `wait_for_device`: a bounded probe-retry loop. One hung transfer no longer
  declares the epoch dead — the probe re-tries over a multi-minute window
  with a backend re-init (`jax.extend.backend.clear_backends()`, the same
  recovery `__graft_entry__._ensure_devices` uses) between attempts.
- `run_phase`: runs one measurement phase as a subprocess with a bounded
  wait, so a mid-run wedge in a later phase cannot zero the phases that
  already completed.

Hard-won constraints of the tunneled axon runtime shape both:

- a wedged epoch hangs TRANSFERS indefinitely while client init
  (`jax.devices()`) stays instant, so only a real round-trip proves life;
- a KILLED chip-attached process leaves a dead client session the remote
  runtime holds for hours, and every such kill REFRESHES the hold — hung
  probes and timed-out phase children are therefore ABANDONED (daemon
  threads, orphaned subprocesses), never killed;
- each abandoned in-flight transfer is itself a dead session, so probes are
  spaced minutes apart (default 3 attempts / 240 s spacing ~= a 10-minute
  recovery window with only 2 extra probes), not hammered every few seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from typing import Callable, Optional


def default_probe() -> float:
    """One real device round-trip: put 8 floats, fetch, sum. Enumeration is
    NOT enough — it stays instant on a wedged epoch."""
    import numpy as np

    import jax

    return float(np.asarray(jax.device_put(np.ones((8,), np.float32))).sum())


def reinit_backend() -> str:
    """Drop every live backend client and re-init. On a wedged epoch the
    hung transfer belongs to the OLD client; a fresh client sometimes gets a
    fresh runtime session (and costs nothing when it doesn't)."""
    import jax
    import jax.extend.backend as jexb

    jexb.clear_backends()
    return jax.default_backend()


def probe_once(probe: Callable[[], float], timeout_s: float) -> dict:
    """Run `probe` in a daemon thread with a bounded join. A hung probe is
    abandoned (the thread is stuck in C inside the runtime; daemon threads
    do not block interpreter exit) — the caller must hard-exit via
    `os._exit` if any probe hung, and `wait_for_device` records that in
    `hung_probes`."""
    box: dict = {}

    def run():
        try:
            box["value"] = probe()
        except Exception as e:  # noqa: BLE001 - surfaced to the caller
            box["error"] = repr(e)

    t = threading.Thread(target=run, daemon=True, name="device-probe")
    start = time.monotonic()
    t.start()
    t.join(timeout_s)
    took = round(time.monotonic() - start, 1)
    if t.is_alive():
        return {"status": "hung", "took_s": took}
    if "error" in box:
        return {"status": "error", "error": box["error"], "took_s": took}
    return {"status": "ok", "took_s": took}


def wait_for_device(
    probe: Callable[[], float] = default_probe,
    attempts: int = 3,
    timeout_s: float = 120.0,
    spacing_s: float = 240.0,
    reinit: Callable[[], object] = reinit_backend,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """Bounded probe-retry: probe, and on failure wait `spacing_s`, re-init
    the backend, probe again — up to `attempts` probes. Returns
    ``{"ok": bool, "attempts": [...], "hung_probes": int, "waited_s": s}``.
    The spacing is deliberately minutes, not seconds: each abandoned hung
    probe is a dead session the wedged runtime holds (see module docstring).
    """
    t0 = time.monotonic()
    history = []
    hung = 0
    ok = False
    for i in range(max(1, attempts)):
        if i > 0:
            sleep(spacing_s)
            try:
                reinit()
                history.append({"action": "reinit", "status": "ok"})
            except Exception as e:  # noqa: BLE001 - recovery is best-effort
                history.append({"action": "reinit", "status": repr(e)})
        r = probe_once(probe, timeout_s)
        r["action"] = "probe"
        history.append(r)
        if r["status"] == "hung":
            hung += 1
        if r["status"] == "ok":
            ok = True
            break
    return {
        "ok": ok,
        "attempts": history,
        "hung_probes": hung,
        "waited_s": round(time.monotonic() - t0, 1),
    }


def run_phase(
    cmd: list[str],
    out_path: str,
    timeout_s: float,
    log_path: Optional[str] = None,
    env: Optional[dict] = None,
) -> dict:
    """Run one measurement phase as a subprocess that writes its JSON result
    to `out_path`; wait at most `timeout_s`. Returns one of:

    - ``{"status": "ok", "result": <parsed json>, "took_s": s}``
    - ``{"status": "crashed", "rc": n, "log_tail": "...", "took_s": s}``
    - ``{"status": "timeout", "took_s": s}`` — the child is ABANDONED, not
      killed: it holds a live chip session, and killing it would wedge the
      runtime for hours (it becomes an orphan and exits on its own, or dies
      with the round).
    - ``{"status": "no-output", ...}`` — exited 0 without writing the file.

    The child's stdout/stderr go to `log_path` (default: out_path + ".log")
    so the parent's stdout carries ONLY parseable headline lines.
    """
    log_path = log_path or out_path + ".log"
    if os.path.exists(out_path):
        os.unlink(out_path)
    t0 = time.monotonic()
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT, stdin=subprocess.DEVNULL,
            env=env,
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            return {
                "status": "timeout",
                "took_s": round(time.monotonic() - t0, 1),
                "log": log_path,
            }
    took = round(time.monotonic() - t0, 1)
    if rc != 0:
        tail = ""
        try:
            with open(log_path) as f:
                tail = f.read()[-800:]
        except OSError:
            pass
        return {"status": "crashed", "rc": rc, "log_tail": tail, "took_s": took}
    if not os.path.exists(out_path):
        return {"status": "no-output", "took_s": took, "log": log_path}
    try:
        with open(out_path) as f:
            return {"status": "ok", "result": json.load(f), "took_s": took}
    except (OSError, json.JSONDecodeError) as e:
        return {"status": "bad-output", "error": repr(e), "took_s": took}


def phase_cmd(script: str, phase: str, out_path: str, flags: list[str]) -> list[str]:
    """Command line for a bench phase child (same interpreter + flags)."""
    return [sys.executable, script, "--phase", phase, "--out", out_path, *flags]
