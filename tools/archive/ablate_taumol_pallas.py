"""Ablate pieces of the Pallas taumol kernel to find where time goes.

Strips features from BAND_SPECS (dataclasses.replace) before building
PallasTaumol, so both the tables and the kernel code shrink together.
Numbers are wall times of the chained flat kernel at B*L=245k cells.
"""
import sys, pathlib, time, dataclasses
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
import rrtmg_lw_tpu.ops.taumol_pallas as tp
import rrtmg_lw_tpu.ops.taumol as tm
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False,
                            taumol_impl="xla"))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc0 = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc0)

ORIG = tm.BAND_SPECS


def strip(**kill):
    def fix(spec):
        kw = {}
        if kill.get("minors"):
            kw["minors"] = ()
        if kill.get("selffor"):
            kw.update(tauself=False, taufor=False)
        if kill.get("frac_eta"):
            kw["frac_eta"] = None
        if kill.get("eta") and spec.key2 is not None:
            kw.update(key2=None, rat=None)
        if kill.get("key"):
            kw.update(key1=None, key2=None, rat=None)
        if kill.get("cfcs"):
            kw["cfcs"] = ()
        return dataclasses.replace(spec, **kw)
    return tuple(dataclasses.replace(bs, lower=fix(bs.lower),
                                     upper=fix(bs.upper)) for bs in ORIG)


def bench(tag, specs):
    tm.BAND_SPECS = specs
    tp.BAND_SPECS = specs
    # stripped frac_eta leaves 2-D frac tables: collapse to eta col 0
    kt = {}
    for name, tabs in model.ktables.items():
        tabs = dict(tabs)
        for k, v in tabs.items():
            if k.startswith("fracref") and np.asarray(v).ndim == 2 and any(
                    (bs.lower.frac_eta is None and bs.upper.frac_eta is None)
                    for bs in specs if f"b{bs.band:02d}" == name):
                tabs[k] = np.asarray(v)[0]      # (eta, ng) -> (ng,)
        kt[name] = tabs
    pt = tp.PallasTaumol(kt, model.static_np)

    @jax.jit
    def step(sc, prof, eps):
        sc2 = sc._replace(fac00=sc.fac00 + eps)
        scf, sci = pt._pack(sc2, prof, pad=0)
        tg, fr = pt._kernel(B * L, scf, sci, *pt._tables_dev)
        return tg, tg[0, 0] * 1e-20

    eps = jnp.float32(0.0)
    tg, eps = step(sc0, prof, eps); jax.block_until_ready(tg)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        tg, eps = step(sc0, prof, eps)
    jax.block_until_ready(tg)
    dt = (time.perf_counter() - t0) / N
    print(f"{tag:24s} {dt*1e3:8.2f} ms")
    tm.BAND_SPECS = ORIG
    tp.BAND_SPECS = ORIG
    return dt


full = bench("full", ORIG)
bench("no minors", strip(minors=True))
bench("no self/for", strip(selffor=True))
bench("no frac_eta", strip(frac_eta=True))
bench("1-key only (no eta)", strip(eta=True))
bench("no key term", strip(key=True))
bench("key only", strip(minors=True, selffor=True, frac_eta=True,
                        cfcs=True))
