import sys, pathlib, time, dataclasses
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops import taumol as tm
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc)

def bench(f, n=5):
    o = f(sc, prof); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(sc, prof)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

eng = model.engine
full = bench(jax.jit(lambda s, p: eng(s, p)))
print(f"full engine {full*1e3:8.2f} ms")

# per-band timing
for bspec in tm.BAND_SPECS:
    def one(s, p, bspec=bspec):
        tl, fl = eng._region(bspec.lower, bspec.band, True, s, p)
        tu, fu = eng._region(bspec.upper, bspec.band, False, s, p)
        m = s.laytrop_mask[..., None]
        return jnp.where(m, tl, tu), jnp.where(m, fl, fu)
    t = bench(jax.jit(one))
    print(f"band {bspec.band:2d}  {t*1e3:8.2f} ms")
