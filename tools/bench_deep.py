"""Deep-profile (production nlay ~70-140) A/B: chunked-input level
cache vs no cache, same process back-to-back (chained timing).

The whole-profile VMEM residency flips off around nlay 70-90 (cloudy);
this measures what the Lp-sized down-sweep cache is worth when inputs
must stream per chunk (rtrn_pallas.py `cache and not resident`).
"""
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

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere, make_mcica_clouds

B = int(os.environ.get("BENCH_NCOLS", 4096))
L = int(os.environ.get("BENCH_NLAY", 140))
N = int(os.environ.get("BENCH_ITERS", 20))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
platform = jax.default_backend()
layout = os.environ.get("BENCH_LAYOUT",
                        "compact" if platform == "tpu" else "batch")
clouds = make_mcica_clouds(ncol=B, nlay=L, dtype=jnp.float32,
                           layout=layout)


def bench(step, args):
    eps = jnp.zeros((), jnp.float32)
    out, eps = step(*args, eps)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out, eps = step(*args, eps)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N


def run(tag):
    clr_model = make_model(LWConfig(icld=0, dtype="float32",
                                    use_lut=False))

    @jax.jit
    def clr_step(a, eps):
        fl = clr_model(a._replace(tlay=a.tlay + eps), None)
        return fl, fl.uflx[0, 0] * 1e-20

    t = bench(clr_step, (atm,))
    print(f"[{tag}] clear  L={L} {t*1e3:7.2f} ms  {B/t:10.0f} cols/s")

    cld_model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                                    use_lut=False))

    @jax.jit
    def cld_step(a, c, eps):
        fl = cld_model(a._replace(tlay=a.tlay + eps), c)
        return fl, fl.uflx[0, 0] * 1e-20

    t = bench(cld_step, (atm, clouds))
    print(f"[{tag}] cloudy L={L} {t*1e3:7.2f} ms  {B/t:10.0f} cols/s")
    return clr_step, cld_step


# A: cache enabled (default heuristics). B: cache forced off.
# The env var is read inside rt_fluxes_pallas at trace time, so the two
# jitted step pairs keep their own kernel configs within one process.
run("cache")
os.environ["RRTMG_RT_NO_CACHE"] = "1"
run("nocache")
del os.environ["RRTMG_RT_NO_CACHE"]
