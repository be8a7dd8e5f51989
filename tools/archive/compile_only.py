import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.taumol_pallas import PallasTaumol
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 256, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc)
pt = PallasTaumol(model.ktables, model.static_np)
t0 = time.perf_counter()
tg, fr = pt(sc, prof)
jax.block_until_ready(tg)
print(f"compile+first-run: {time.perf_counter()-t0:.1f} s")
rt, rf = jax.jit(lambda s, p: model.engine(s, p))(sc, prof)
print("taug max abs diff:", np.abs(np.asarray(tg)-np.asarray(rt)).max())
print("fracs max abs diff:", np.abs(np.asarray(fr)-np.asarray(rf)).max())
