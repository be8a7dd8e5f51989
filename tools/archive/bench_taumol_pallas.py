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
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc)

pt = PallasTaumol(model.ktables, model.static_np)

# correctness vs engine on a subset
scs = jax.tree_util.tree_map(lambda x: x[:64], sc)
profs = jax.tree_util.tree_map(lambda x: x[:64] if hasattr(x, 'ndim') and x.ndim else x, prof)
rt, rf = jax.jit(lambda s, p: model.engine(s, p))(scs, profs)
kt_, kf = pt(scs, profs)
dt_ = np.abs(np.asarray(kt_) - np.asarray(rt))
print("taug max abs diff:", dt_.max())
print("fracs max abs diff:", np.abs(np.asarray(kf) - np.asarray(rf)).max())

# chained timing
@jax.jit
def step(sc, prof, eps):
    sc2 = sc._replace(fac00=sc.fac00 + eps)
    tg, fr = pt._kernel(B * L, *_pack(sc2, prof))
    return tg, tg[0, 0] * 1e-20

def _pack(sc, prof):
    # reuse pt.__call__ packing
    import rrtmg_lw_tpu.ops.taumol_pallas as tp
    cols = [getattr(sc, n).reshape(-1).astype(jnp.float32) for n in tp.F_FIELDS]
    cols += [prof.pavel.reshape(-1).astype(jnp.float32),
             prof.coldry.reshape(-1).astype(jnp.float32)]
    cols += [prof.wx[..., i].reshape(-1).astype(jnp.float32) for i in range(4)]
    scf = jnp.stack(cols)
    ints = [getattr(sc, n).reshape(-1).astype(jnp.int32) for n in tp.I_FIELDS]
    ints.append(sc.laytrop_mask.astype(jnp.int32).reshape(-1))
    return (jnp.stack(ints) * 0 + jnp.stack(ints), ) and (scf, jnp.stack(ints)) + pt._tables_dev

eps = jnp.float32(0.0)
out, eps = step(sc, prof, eps); jax.block_until_ready(out)
t0 = time.perf_counter()
N = 20
for _ in range(N): out, eps = step(sc, prof, eps)
jax.block_until_ready(out)
dtm = (time.perf_counter()-t0)/N
print(f"pallas taumol chained: {dtm*1e3:.2f} ms  ({B*L/dtm/1e6:.1f} Mcells/s)")
