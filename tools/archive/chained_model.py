import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)

@jax.jit
def step(atm, eps):
    atm2 = atm._replace(tlay=atm.tlay + eps)
    fl = model(atm2, None)
    return fl, fl.uflx[0, 0] * 1e-12

eps = jnp.float32(0.0)
fl, eps = step(atm, eps); jax.block_until_ready(fl)
t0 = time.perf_counter()
N = 10
for _ in range(N): fl, eps = step(atm, eps)
jax.block_until_ready(fl)
dt = (time.perf_counter()-t0)/N
print(f"full chained: {dt*1e3:.2f} ms  {B/dt:.0f} cols/s")

prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
@jax.jit
def tstep(prof, eps):
    p2 = prof._replace(tavel=prof.tavel + eps)
    sc = setcoef(p2, model.static, istart=1, idrv=0)
    taug, fracs = model.engine(sc, p2)
    return taug, taug[0, 0, 0] * 1e-12
tg, eps = tstep(prof, jnp.float32(0.0)); jax.block_until_ready(tg)
t0 = time.perf_counter()
for _ in range(N): tg, eps = tstep(prof, eps)
jax.block_until_ready(tg)
dt = (time.perf_counter()-t0)/N
print(f"setcoef+taumol chained: {dt*1e3:.2f} ms")
