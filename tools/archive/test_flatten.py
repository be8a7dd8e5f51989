import sys, pathlib, time
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

def flat2(x):
    if hasattr(x, 'ndim') and x.ndim >= 2 and x.shape[:2] == (B, L):
        return x.reshape((1, B * L) + x.shape[2:])
    return x

sc_f = jax.tree_util.tree_map(flat2, sc)
prof_f = jax.tree_util.tree_map(flat2, prof)

def bench(f, *a, n=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

eng = model.engine
t3d = bench(jax.jit(lambda s, p: eng(s, p)), sc, prof)
tfl = bench(jax.jit(lambda s, p: eng(s, p)), sc_f, prof_f)
print(f"3d (B,L):   {t3d*1e3:8.2f} ms")
print(f"flat (1,N): {tfl*1e3:8.2f} ms")
# correctness
a = jax.jit(lambda s, p: eng(s, p))(sc, prof)
b = jax.jit(lambda s, p: eng(s, p))(sc_f, prof_f)
print("match:", np.allclose(np.asarray(a[0]).reshape(-1, 140),
                            np.asarray(b[0]).reshape(-1, 140), rtol=1e-6))
