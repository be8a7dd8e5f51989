import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, os
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere, make_mcica_clouds
from rrtmg_lw_tpu.ops import rtrn as rt

B, L = 4096, 60
cfg = LWConfig(icld=0, dtype="float32", use_lut=False)
model = make_model(cfg)
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
jax.block_until_ready(prof)

def bench(f, *args, n=10):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

f_inatm = jax.jit(lambda a: inatm(a, dtype=jnp.float32))
t_inatm = bench(f_inatm, atm)

f_setcoef = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))
sc = f_setcoef(prof); jax.block_until_ready(sc)
t_setcoef = bench(f_setcoef, prof)

f_taumol = jax.jit(lambda s, p: model.engine(s, p))
t_taumol = bench(f_taumol, sc, prof)
taug, fracs = f_taumol(sc, prof)

zero_g = jnp.zeros(taug.shape, jnp.float32)
cl = jnp.zeros((B, L), bool)
gate = jnp.zeros(taug.shape, bool)
f_rt = jax.jit(lambda taut, fr, s, p: rt.rt_random_overlap(
    taut, fr, s.planklay, s.planklev, s.plankbnd, s.dplankbnd_dt,
    p.semiss, p.pwvcm, p.pz, zero_g, zero_g, cloudy_lay=cl, cld_gate=gate,
    static=model.static_np, luts=model.luts, use_lut=False, idrv=0,
    heatfac_val=model.heatfac))
t_rt = bench(f_rt, taug, fracs, sc, prof)

f_full = jax.jit(lambda a: model(a, None))
t_full = bench(f_full, atm)
print(f"B={B} L={L}")
for k, v in [("inatm", t_inatm), ("setcoef", t_setcoef),
             ("taumol", t_taumol), ("rtrn", t_rt), ("full", t_full)]:
    print(f"{k:8s} {v*1e3:8.2f} ms   {B/v:10.0f} cols/s")
