import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)

f = jax.jit(lambda s, p: model.engine(s, p))
lowered = f.lower(sc, prof)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
for k in sorted(ca):
    v = ca[k]
    if isinstance(v, float) and v > 1e6:
        print(f"{k:40s} {v:.3e}")
print("flops GF:", ca.get("flops", 0)/1e9)
print("bytes GB:", ca.get("bytes accessed", 0)/1e9)
