"""Measure the gradient (training) step on-chip: wall + device time.

VERDICT r4 #1: autodiff is an advertised capability
(parallel/api.make_sharded_grad_step, custom_vjp in both Pallas
kernels) but its cost had never been measured.  Objective = the
default sharded-grad-step loss (mean hr^2 + mean OLR^2), grad w.r.t.
the full Atmosphere pytree, McICA cloudy pipeline.

Chained best-of-3 windows per the measurement hygiene rules; run solo.

Usage: python tools/grad_bench.py [--ncol 16384] [--nlay 60]
           [--iters 5] [--json OUT]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=16384)
    ap.add_argument("--nlay", type=int, default=60)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a device-time xprof trace")
    ap.add_argument("--fwd", action="store_true",
                    help="also time the forward-only step")
    args = ap.parse_args()

    from rrtmg_lw_tpu import LWConfig, make_model
    from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                              make_mcica_clouds)

    platform = jax.default_backend()
    dev = jax.devices()[0]
    B, L = args.ncol, args.nlay
    layout = "compact" if platform == "tpu" else "batch"

    model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                                use_lut=False))
    atm = jax.device_put(make_atmosphere(ncol=B, nlay=L,
                                         dtype=jnp.float32), dev)
    clouds = jax.device_put(make_mcica_clouds(
        ncol=B, nlay=L, dtype=jnp.float32, layout=layout,
        mask_dtype=np.int8 if layout == "compact" else None), dev)

    def loss_fn(a, c):
        fl = model(a, c)
        return (fl.hr ** 2).mean() + (fl.uflx[:, -1] ** 2).mean()

    @jax.jit
    def grad_step(a, c, eps):
        loss, g = jax.value_and_grad(loss_fn)(
            a._replace(tlay=a.tlay + eps), c)
        return loss, g

    @jax.jit
    def fwd_step(a, c, eps):
        fl = model(a._replace(tlay=a.tlay + eps), c)
        return fl.uflx[0, 0]

    results = {}

    def bench(step, tag, iters):
        eps = jnp.zeros((), jnp.float32)
        out = step(atm, clouds, eps)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            e = eps
            for _ in range(iters):
                out = step(atm, clouds, e)
                first = out[0] if isinstance(out, tuple) else out
                e = first.astype(jnp.float32).reshape(()) * 1e-20
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / iters)
        best = min(times)
        spread = (max(times) - best) / best
        row = {"workload": tag, "ncol": B, "nlay": L,
               "ms_per_step": round(best * 1e3, 3),
               "cols_per_sec": round(B / best, 1),
               "spread": round(spread, 4), "iters": iters,
               "platform": platform}
        if args.trace and platform == "tpu":
            from rrtmg_lw_tpu.utils.device_time import \
                device_seconds_per_iter
            state = {"eps": jnp.zeros((), jnp.float32)}

            def run_iter():
                out = step(atm, clouds, state["eps"])
                first = out[0] if isinstance(out, tuple) else out
                state["eps"] = first.astype(jnp.float32
                                            ).reshape(()) * 1e-20
                return out
            try:
                dev_s, detail = device_seconds_per_iter(run_iter,
                                                        iters=3)
                row["device_ms"] = (round(dev_s * 1e3, 3)
                                    if dev_s else None)
                row["device_lanes"] = detail.get("lanes")
            except Exception as e:          # noqa: BLE001
                row["device_trace_error"] = str(e).splitlines()[0][:120]
        results[tag] = row
        print(json.dumps(row))
        return row

    if args.fwd:
        bench(fwd_step, "mcica_cloudy_fwd", max(args.iters, 5))
    bench(grad_step, "mcica_cloudy_grad", args.iters)

    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(results,
                                                      indent=1))


if __name__ == "__main__":
    main()
