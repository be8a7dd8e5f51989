"""On-chip A/B matrix for the RT sweep kernel's launch-shape knobs.

Runs a matrix of kernel configurations back-to-back in ONE process with
chained timing (the axon chip drifts +-10-15% between processes, so
cross-process comparisons are meaningless — see PERF_NOTES).  Each
configuration sets its env knobs and builds a FRESH jitted step (the
knobs are read at trace time).

Knobs swept:
  RRTMG_RT_TILE      column tile / lane width (128 default, 256)
  RRTMG_RT_LC        level chunk (20 clear / 12 cloudy defaults)
  RRTMG_RT_NO_RESIDENT  chunked-input + level-cache VMEM plan
  RRTMG_RT_NO_CACHE  no down-sweep factor cache at all

Usage (TPU):  python tools/ab_matrix.py [--ncol 16384] [--iters 20]
Writes AB_MATRIX.json next to the repo root and prints a table.
"""
import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

KNOBS = ["RRTMG_RT_TILE", "RRTMG_RT_LC",
         "RRTMG_RT_NO_RESIDENT", "RRTMG_RT_NO_CACHE",
         "RRTMG_PLANCK_TILE", "RRTMG_TAUMOL_TILE"]

# (name, env) — env values are strings; None clears the knob
CONFIGS = [
    ("baseline", {}),
    ("tile256", {"RRTMG_RT_TILE": "256"}),
    ("lc6", {"RRTMG_RT_LC": "6"}),
    ("lc10", {"RRTMG_RT_LC": "10"}),
    ("lc15", {"RRTMG_RT_LC": "15"}),
    ("lc20", {"RRTMG_RT_LC": "20"}),
    ("lc30", {"RRTMG_RT_LC": "30"}),
    ("tile256_lc10", {"RRTMG_RT_TILE": "256", "RRTMG_RT_LC": "10"}),
    ("ptile2048", {"RRTMG_PLANCK_TILE": "2048"}),
    ("ptile1024", {"RRTMG_PLANCK_TILE": "1024"}),
    ("no_resident", {"RRTMG_RT_NO_RESIDENT": "1"}),
    ("no_cache", {"RRTMG_RT_NO_CACHE": "1"}),
    # combos of the round-1 single-knob winners (tile256 cloudy,
    # ptile2048 clear, lc30 marginal) — same-process so the chained
    # timing stays comparable
    ("t256_p2048", {"RRTMG_RT_TILE": "256", "RRTMG_PLANCK_TILE": "2048"}),
    ("t256_lc30", {"RRTMG_RT_TILE": "256", "RRTMG_RT_LC": "30"}),
    ("t256_lc30_p2048", {"RRTMG_RT_TILE": "256", "RRTMG_RT_LC": "30",
                         "RRTMG_PLANCK_TILE": "2048"}),
    ("t256_nores", {"RRTMG_RT_TILE": "256", "RRTMG_RT_NO_RESIDENT": "1"}),
    # round-3 session-2 re-tune after the batched-expansion RT kernel
    # and fused-setcoef taumol (per-level dot counts changed, so the
    # chunk-size and tile tradeoffs may have shifted)
    ("tm1024", {"RRTMG_TAUMOL_TILE": "1024"}),
    ("tm4096", {"RRTMG_TAUMOL_TILE": "4096"}),
    ("lc12", {}),                       # alias of baseline (defaults)
    ("r3_lc6", {"RRTMG_RT_LC": "6"}),
    ("r3_lc20", {"RRTMG_RT_LC": "20"}),
]


def bench(step, args, iters, windows=3):
    """Best of ``windows`` chained-timing windows: the FIRST window
    after a compile carries a large one-off tunnel stall (measured
    ~800 ms on a 10.6 ms step), so single-window numbers are
    garbage — same protocol as bench.py."""
    eps = jnp.zeros((), jnp.float32)
    out, eps = step(*args, eps)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, eps = step(*args, eps)  # chained: eps feeds back in
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=16384)
    ap.add_argument("--nlay", type=int, default=60)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--configs", default="",
                    help="comma-separated subset of config names")
    ap.add_argument("--modes", default="clear,cloudy")
    ap.add_argument("--out", default="AB_MATRIX.json",
                    help="output file name (repo root); use "
                         "AB_MATRIX_DEEP.json for the nlay=140 sweep")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rrtmg_lw_tpu import LWConfig, make_model
    from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                              make_mcica_clouds)

    import numpy as np

    B, L = args.ncol, args.nlay
    platform = jax.default_backend()
    layout = "compact" if platform == "tpu" else "batch"
    # generators return HOST numpy (streaming contract): pin the
    # workloads to the device ONCE, exactly like bench.py, or every
    # timed iteration re-uploads ~300 MB over the tunnel and the A/B
    # deltas drown in transfer noise
    dev = jax.devices()[0]
    atm = jax.device_put(
        make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32), dev)
    clouds = jax.device_put(
        make_mcica_clouds(ncol=B, nlay=L, dtype=jnp.float32,
                          layout=layout,
                          mask_dtype=np.int8 if layout == "compact"
                          else None), dev)
    jax.block_until_ready((atm, clouds))
    want = set(args.configs.split(",")) if args.configs else None
    modes = args.modes.split(",")

    results = []
    for name, env in CONFIGS:
        if want and name not in want:
            continue
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        row = {"config": name, "env": env, "ncol": B, "nlay": L,
               "platform": platform}
        try:
            if "clear" in modes:
                model = make_model(LWConfig(icld=0, dtype="float32",
                                            use_lut=False))

                @jax.jit
                def clr(a, eps, model=model):
                    fl = model(a._replace(tlay=a.tlay + eps), None)
                    return fl, fl.uflx[0, 0] * 1e-20

                row["clear_ms"] = bench(clr, (atm,), args.iters) * 1e3
            if "cloudy" in modes:
                model = make_model(LWConfig(icld=2, imca=1,
                                            dtype="float32",
                                            use_lut=False))

                @jax.jit
                def cld(a, c, eps, model=model):
                    fl = model(a._replace(tlay=a.tlay + eps), c)
                    return fl, fl.uflx[0, 0] * 1e-20

                row["cloudy_ms"] = bench(cld, (atm, clouds),
                                         args.iters) * 1e3
        except Exception as e:                       # config invalid
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        results.append(row)
        print(f"{name:16s} "
              f"clr {row.get('clear_ms', float('nan')):7.2f} ms  "
              f"cld {row.get('cloudy_ms', float('nan')):7.2f} ms"
              + ("  ERR " + row["error"][:80] if "error" in row else ""),
              flush=True)
    for k in KNOBS:
        os.environ.pop(k, None)

    out = REPO / args.out
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
