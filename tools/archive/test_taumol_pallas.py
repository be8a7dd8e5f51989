import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
if os.environ.get("FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np, jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.taumol_pallas import PallasTaumol
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 16, 51
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)

ref_tg, ref_fr = jax.jit(lambda s, p: model.engine(s, p))(sc, prof)

pt = PallasTaumol(model.ktables, model.static_np,
                  interpret=bool(os.environ.get("FORCE_CPU")))
tg, fr = pt(sc, prof)
tg, fr = np.asarray(tg), np.asarray(fr)
ref_tg, ref_fr = np.asarray(ref_tg), np.asarray(ref_fr)
dt = np.abs(tg - ref_tg)
df = np.abs(fr - ref_fr)
rel = dt / (np.abs(ref_tg) + 1e-30)
print("taug  max abs diff:", dt.max(), " max rel:", rel.max())
print("fracs max abs diff:", df.max())
bad = np.unravel_index(rel.argmax(), rel.shape)
print("worst cell:", bad, "band g:", bad[2], "vals", tg[bad], ref_tg[bad])

# per-band relative diff breakdown
import numpy as _np
NGs = (10,12,16,14,16,8,12,8,12,6,8,8,4,2,2,2)
ofs = 0
for b, ng in enumerate(NGs, 1):
    sl = slice(ofs, ofs+ng); ofs += ng
    r = (dt[..., sl] / (np.abs(ref_tg[..., sl]) + 1e-30)).max()
    a = dt[..., sl].max()
    print(f"band {b:2d}: maxrel {r:.3e}  maxabs {a:.3e}")
lm = np.asarray(sc.laytrop_mask)
up_cells = ~lm
print("diff only in upper?", dt[lm].max(), dt[~lm].max())
