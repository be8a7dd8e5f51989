"""Throughput benchmark: columns/sec for the batched LW radiation step.

Runs the flagship pipeline (clear-sky and McICA cloudy-sky) on whatever
backend JAX provides (one real TPU chip under the driver) and prints ONE
JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (documented in PERF_NOTES.md):
- Generators return HOST numpy (streaming contract); the bench
  `jax.device_put`s each workload ONCE before the timed loop and
  asserts every timed argument is a committed `jax.Array` — so an
  input-transfer regression can never masquerade as kernel time
  (round-2 postmortem: host-resident args re-uploaded ~370 MB per
  timed iteration over the axon tunnel, 100x collapse).
- Chained timing: each iteration's input depends on the previous
  output (the runtime cannot coalesce identical dispatches).
- Each workload runs REPEATS timed windows; best window is reported
  with the relative spread, per-workload, as JSON lines on stderr and
  in BENCH_DETAIL.json.  The official stdout line is computed from
  the best windows of the two headline workloads (clear + McICA
  cloudy at B=BENCH_NCOLS, nlay=BENCH_NLAY).
- vs_baseline compares against bench_baseline.json (same-shape entry
  re-pinned each round; reference publishes no speed numbers).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parent

# persistent compile cache: Pallas kernels are expensive to build
jax.config.update("jax_compilation_cache_dir",
                  str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _assert_device_resident(tree, what):
    """Every timed argument must already live on the device, committed,
    or the timed loop measures H2D transfers instead of kernels."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        if not isinstance(leaf, jax.Array):
            raise AssertionError(
                f"bench input {what}{jax.tree_util.keystr(path)} is "
                f"{type(leaf).__name__}, not a device-resident "
                f"jax.Array — the timed loop would re-upload it every "
                f"iteration")
        if not leaf.committed:
            raise AssertionError(
                f"bench input {what}{jax.tree_util.keystr(path)} is "
                f"an uncommitted jax.Array — placement is not pinned")


def _compile_warm(step, args, eps, attempts=3):
    """First (compiling) call with bounded retries: the axon
    remote-compile endpoint occasionally drops mid-response
    ('response body closed before all bytes were read'); a transient
    flake must not cost the round its benchmark artifact."""
    for attempt in range(attempts):
        try:
            return step(*args, eps)
        except Exception as e:                      # noqa: BLE001
            msg = str(e)
            transient = ("remote_compile" in msg or "read body" in msg
                         or "DEADLINE" in msg or "UNAVAILABLE" in msg)
            if not transient or attempt == attempts - 1:
                raise
            print(f"transient compile failure (attempt {attempt + 1}):"
                  f" {msg.splitlines()[0][:120]}", file=sys.stderr)
            time.sleep(10.0 * (attempt + 1))


def _bench_one(step, args, iters, repeats=3):
    """Best-of-`repeats` chained-timing windows; returns
    (best_seconds_per_iter, relative_spread)."""
    for i, a in enumerate(args):
        _assert_device_resident(a, f"arg{i}")
    eps = jnp.zeros((), jnp.float32)
    out, eps = _compile_warm(step, args, eps)      # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, eps = step(*args, eps)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    spread = (max(times) - best) / best if best > 0 else 0.0
    return best, spread


def _bench_pipelined(step, args_a, args_b, iters, repeats=3):
    """Deployment steady state: consecutive steps are INDEPENDENT
    (different batches), so the runtime overlaps dispatch with device
    execution — unlike the chained protocol, which measures
    latency-bound back-to-back steps.  Alternates two distinct
    device-resident workloads (distinct input buffers defeat dispatch
    coalescing)."""
    eps = jnp.zeros((), jnp.float32)
    outs = [_compile_warm(step, args_a, eps)[0],
            _compile_warm(step, args_b, eps)[0]]
    jax.block_until_ready(outs)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = []
        for i in range(iters):
            out, _ = step(*(args_a if i % 2 == 0 else args_b), eps)
            outs.append(out)
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / iters)
    best = min(times)
    spread = (max(times) - best) / best if best > 0 else 0.0
    return best, spread


def _probe_backend(timeout_s):
    """Initialize the default backend in a subprocess first: a hung
    device tunnel (observed with axon) blocks jax.devices() forever
    with no error, so probe with a hard timeout and fall back to CPU
    rather than hang the whole bench run."""
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except Exception:
        return False


def main():
    from rrtmg_lw_tpu import LWConfig, make_model
    from rrtmg_lw_tpu.ops.rtrn_pallas import resolve_tile
    from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                              make_mcica_clouds)

    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 120))
    if probe_s > 0 and not _probe_backend(probe_s):
        jax.config.update("jax_platforms", "cpu")

    platform = jax.default_backend()
    dev = jax.devices()[0]
    ncol = int(os.environ.get("BENCH_NCOLS",
                              16384 if platform == "tpu" else 256))
    nlay = int(os.environ.get("BENCH_NLAY", 60))
    iters = int(os.environ.get("BENCH_ITERS",
                               10 if platform == "tpu" else 3))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    deep_nlay = int(os.environ.get("BENCH_DEEP_NLAY", 140))
    # deep row at B=16384 (VERDICT r4 #4): the old B=4096 shape spent
    # 40% of wall on unamortized axon dispatch, understating the chip
    # (306.8k cols/s vs 462k wall / 516k device at B=16384 —
    # PERF_NOTES round-4 scaling table)
    deep_ncol = int(os.environ.get(
        "BENCH_DEEP_NCOLS", 16384 if platform == "tpu" else 128))
    run_deep = os.environ.get("BENCH_DEEP", "1" if platform == "tpu"
                              else "0") == "1"
    dtype = jnp.float32

    def put(tree):
        return jax.device_put(tree, dev)

    # clouds in the generator-form compact layout on TPU: the binary
    # sub-column mask at g resolution (g-major like the reference's
    # cldfmcl(ngptlw, ncol, nlay)) + per-layer water paths; the
    # per-g products are re-formed inside the RT kernel (bitwise
    # identical to the blocked layout at 1/4 the HBM traffic)
    layout = "compact" if platform == "tpu" else "batch"

    clr_model = make_model(LWConfig(icld=0, dtype="float32",
                                    use_lut=False))
    cld_model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                                    use_lut=False))

    @jax.jit
    def clr_step(a, eps):
        fl = clr_model(a._replace(tlay=a.tlay + eps), None)
        return fl, fl.uflx[0, 0] * 1e-20

    @jax.jit
    def cld_step(a, c, eps):
        fl = cld_model(a._replace(tlay=a.tlay + eps), c)
        return fl, fl.uflx[0, 0] * 1e-20

    detail = []

    # DERIVED device-time floors, per column, at B=16384/nlay=60
    # (PERF_NOTES round-5 op census + measured v5e primitive rates):
    # clear = taumol kernel 5.7 + RT 3.4 + planck 0.6 + glue 0.5 =
    # 10.2 ms; cloudy = 5.7 + RT 5.2 + cldcoef 0.8 + planck 0.65 +
    # glue 0.6 = 13.0 ms.  Grad floor: fwd 13.5 + taumol bwd 3x5.9 +
    # RT bwd 3x5.2 + cldcoef/planck bwd ~3 = ~50 ms if every backward
    # ran at Pallas cost structure (the measured RT backward is XLA —
    # floor_util honestly reports that headroom).
    # floor_util = floor / measured device time; null where no floor
    # has been derived (deep profiles).
    floor_us_per_col = {"clear": 10.2e3 / 16384,
                        "mcica_cloudy": 13.0e3 / 16384,
                        "mcica_cloudy_grad": 50.0e3 / 16384}

    def device_time(name, step, args, B, L):
        """Per-iteration device ms from a short xprof trace (immune
        to axon dispatch gaps / tunnel jitter, which the wall numbers
        include)."""
        if platform != "tpu" or os.environ.get("BENCH_DEVICE_TRACE",
                                               "1") == "0":
            return None, None, None
        from rrtmg_lw_tpu.utils.device_time import \
            device_seconds_per_iter
        state = {"eps": jnp.zeros((), jnp.float32), "out": None}

        def run_iter():
            state["out"], state["eps"] = step(*args, state["eps"])
            return state["out"]

        try:
            dev_s, _detail = device_seconds_per_iter(run_iter, iters=3)
        except Exception as e:                       # noqa: BLE001
            print(f"device trace failed for {name}: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
            return None, None, None
        if dev_s is None:
            return None, None, None
        # floors are derived at the reference shape; fixed per-step
        # costs make them non-linear in B, so gate on the exact shape
        floor = floor_us_per_col.get(name)
        util = (floor * B * 1e-6 / dev_s
                if (floor is not None and L == 60 and B == 16384
                    and dev_s > 0)
                else None)
        lanes = (_detail or {}).get("lanes")
        return dev_s, util, lanes

    def record(name, B, L, t, spread, extra=None):
        dev_s, util, lanes = device_time(
            name, *extra.pop("_step_args"), B, L) \
            if extra and "_step_args" in extra else (None, None, None)
        row = {"workload": name, "ncol": B, "nlay": L,
               "layout": layout, "tile": resolve_tile(B),
               "ms_per_step": round(t * 1e3, 3),
               "cols_per_sec": round(B / t, 1),
               "spread": round(spread, 4),
               "device_ms": (round(dev_s * 1e3, 3)
                             if dev_s is not None else None),
               "floor_util": (round(util, 3)
                              if util is not None else None),
               # per-lane trace breakdown (ADVICE r4: makes an
               # undercounting lane choice visible in the artifact)
               "device_lanes": lanes,
               "iters": iters, "repeats": repeats,
               "platform": platform}
        if extra:
            row.update(extra)
        detail.append(row)
        print(json.dumps(row), file=sys.stderr)
        return row

    # headline workloads
    atm = put(make_atmosphere(ncol=ncol, nlay=nlay, dtype=dtype))
    clouds = put(make_mcica_clouds(
        ncol=ncol, nlay=nlay, dtype=dtype, layout=layout,
        mask_dtype=np.int8 if layout == "compact" else None))

    t_clr, s_clr = _bench_one(clr_step, (atm,), iters, repeats)
    record("clear", ncol, nlay, t_clr, s_clr,
           {"_step_args": (clr_step, (atm,))})
    t_cld, s_cld = _bench_one(cld_step, (atm, clouds), iters, repeats)
    record("mcica_cloudy", ncol, nlay, t_cld, s_cld,
           {"_step_args": (cld_step, (atm, clouds))})

    # deployment steady state: independent consecutive steps (the
    # streaming pipeline's shape) — dispatch overlaps device work
    if platform == "tpu":
        atm_b = put(make_atmosphere(ncol=ncol, nlay=nlay, dtype=dtype,
                                    seed=1))
        clouds_b = put(make_mcica_clouds(
            ncol=ncol, nlay=nlay, dtype=dtype, layout=layout, seed=1,
            mask_dtype=np.int8 if layout == "compact" else None))
        t_p, s_p = _bench_pipelined(cld_step, (atm, clouds),
                                    (atm_b, clouds_b), iters, repeats)
        record("mcica_cloudy_pipelined", ncol, nlay, t_p, s_p)
        del atm_b, clouds_b

    # gradient (training) step at the official shape — VERDICT r4 #1:
    # autodiff is a flagship capability, so its cost is benched every
    # round (value_and_grad of the default sharded-grad-step loss,
    # w.r.t. the full Atmosphere pytree; backward = in-kernel-vjp
    # Pallas taumol + column-chunked XLA RT vjp)
    if platform == "tpu" and os.environ.get("BENCH_GRAD", "1") == "1":
        def _grad_loss(a, c):
            fl = cld_model(a, c)
            return (fl.hr ** 2).mean() + (fl.uflx[:, -1] ** 2).mean()

        @jax.jit
        def grad_step(a, c, eps):
            loss, g = jax.value_and_grad(_grad_loss)(
                a._replace(tlay=a.tlay + eps), c)
            return g, loss * 1e-20

        t_g, s_g = _bench_one(grad_step, (atm, clouds),
                              max(3, iters // 3), repeats)
        record("mcica_cloudy_grad", ncol, nlay, t_g, s_g,
               {"_step_args": (grad_step, (atm, clouds))})

    # deep-atmosphere workload (GCM production depths)
    if run_deep:
        del atm, clouds                # free HBM for the deep batch
        shapes = [(deep_ncol, deep_nlay, "mcica_cloudy_deep")]
        # round-5 transition: one B=4096 continuity row alongside the
        # new official B=16384 shape (drop next round)
        if platform == "tpu" and deep_ncol == 16384 and \
                os.environ.get("BENCH_DEEP_CONTINUITY", "1") == "1":
            shapes.append((4096, deep_nlay, "mcica_cloudy_deep_b4096"))
        for dn, dl, tag in shapes:
            atm_d = put(make_atmosphere(ncol=dn, nlay=dl, dtype=dtype))
            clouds_d = put(make_mcica_clouds(
                ncol=dn, nlay=dl, dtype=dtype, layout=layout,
                mask_dtype=np.int8 if layout == "compact" else None))
            t_d, s_d = _bench_one(cld_step, (atm_d, clouds_d),
                                  max(3, iters // 2), repeats)
            record(tag, dn, dl, t_d, s_d,
                   {"_step_args": (cld_step, (atm_d, clouds_d))})
            del atm_d, clouds_d

    cols_per_sec = 2.0 * ncol / (t_clr + t_cld)

    base_path = REPO / "bench_baseline.json"
    vs = 1.0
    ref = 0.0
    if base_path.exists():
        try:
            base = json.loads(base_path.read_text())
            entry = base.get(platform, base.get("value", 0.0))
            if isinstance(entry, dict):
                ref = float(entry.get("cols_per_sec", 0.0))
            else:
                ref = float(entry)
            if ref > 0:
                vs = cols_per_sec / ref
        except Exception:
            pass

    try:
        (REPO / "BENCH_DETAIL.json").write_text(
            json.dumps({"detail": detail,
                        "headline_cols_per_sec": round(cols_per_sec, 1),
                        "baseline": ref}, indent=1))
    except OSError:
        pass

    print(json.dumps({
        "metric": f"columns_per_sec_{platform}_clr+mcica_nlay{nlay}",
        "value": round(cols_per_sec, 1),
        "unit": "columns/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
