import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.taumol_pallas import PallasTaumol
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc0 = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc0)
pt = PallasTaumol(model.ktables, model.static_np)

@jax.jit
def step(sc, prof, eps):
    sc2 = sc._replace(fac00=sc.fac00 + eps)
    tg, fr = pt(sc2, prof)
    return tg, tg[0, 0, 0] * 1e-20

eps = jnp.float32(0.0)
tg, eps = step(sc0, prof, eps); jax.block_until_ready(tg)
t0 = time.perf_counter()
N = 30
for _ in range(N): tg, eps = step(sc0, prof, eps)
jax.block_until_ready(tg)
dt = (time.perf_counter()-t0)/N
print(f"pallas taumol chained: {dt*1e3:.2f} ms ({B*L/dt/1e6:.1f} Mcells/s)")
