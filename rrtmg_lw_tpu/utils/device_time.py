"""Measure per-iteration DEVICE time via a short xprof trace.

The official bench wall-clock includes ~2-3 ms/step of axon dispatch
and tunnel jitter (spreads of 60-160x on bad windows, PERF_NOTES), so
a real kernel regression under ~15% can hide inside the noise.  This
module captures a few chained iterations under ``jax.profiler.trace``
and parses the exported Chrome-trace export: the sum of X-event
durations on the device process's top-level lane divided by the
iteration count is the device ms/step — immune to dispatch gaps and
host scheduling.

Lane selection: the trace has one process per device plus host
processes; device lanes nest (module events above op events), so
summing every lane double-counts.  We take, per device pid, the single
busiest thread lane (the module lane when thread names are present —
it covers ops exactly once).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile

import jax

_DEVICE_HINTS = ("TPU", "Tensor", "/device", "Chip")


def _parse_trace(logdir):
    files = sorted(glob.glob(os.path.join(logdir, "**",
                                          "*.trace.json.gz"),
                             recursive=True))
    if not files:
        return None
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    pid_name = {}
    tid_name = {}
    lanes = {}                          # (pid, tid) -> busy us
    for ev in data.get("traceEvents", []):
        ph = ev.get("ph")
        if ph == "M":
            if ev.get("name") == "process_name":
                pid_name[ev.get("pid")] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_name[(ev.get("pid"), ev.get("tid"))] = \
                    ev["args"].get("name", "")
        elif ph == "X":
            key = (ev.get("pid"), ev.get("tid"))
            lanes[key] = lanes.get(key, 0.0) + ev.get("dur", 0.0)
    dev_pids = {p for p, n in pid_name.items()
                if any(h.lower() in n.lower() for h in _DEVICE_HINTS)}
    if not dev_pids:
        return None
    busy_us = 0.0
    lanes_used = []
    for pid in dev_pids:
        plane = {k: v for k, v in lanes.items() if k[0] == pid}
        if not plane:
            continue
        # prefer an explicitly named module lane; else the busiest
        mod = [k for k in plane
               if "module" in tid_name.get(k, "").lower()]
        key = mod[0] if mod else max(plane, key=plane.get)
        busy_us += plane[key]
        lanes_used.append((pid_name.get(pid, ""),
                           tid_name.get(key, str(key[1])),
                           round(plane[key] / 1e3, 3)))
    return {"busy_ms": busy_us / 1e3, "lanes": lanes_used,
            "processes": pid_name}


def device_seconds_per_iter(run_iter, iters=3, logdir=None):
    """Trace ``iters`` calls of ``run_iter()`` (each one chained step;
    the caller owns warmup + final block) and return
    (device_seconds_per_iter | None, detail dict)."""
    own = logdir is None
    if own:
        logdir = tempfile.mkdtemp(prefix="xprof_bench_")
    try:
        with jax.profiler.trace(logdir):
            out = None
            for _ in range(iters):
                out = run_iter()
            jax.block_until_ready(out)
        parsed = _parse_trace(logdir)
    finally:
        if own:
            import shutil
            shutil.rmtree(logdir, ignore_errors=True)
    if parsed is None:
        return None, {"error": "no device lanes found in trace"}
    return parsed["busy_ms"] / 1e3 / iters, parsed
