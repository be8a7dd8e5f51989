"""Clamp-edge parity: vectorized physics vs the scalar oracle on
profiles engineered to hit every index clamp in the reference.

The reference clamps all table indices at their edges (setcoef.f90:
indbound/indlev 1..180, jp 1..58, jt/jt1 1..4, indfor 1..2,
indself 1..9, indminor 1..18; taumol.f90: specparm -> oneminus,
colxx==0 -> 1e-32*coldry floors, over-abundance adjustments).  The
smooth synthetic atmospheres in test_core_vs_oracle rarely reach
those edges; these columns are built to sit on them:

  col 0: polar-night extreme — tsfc 150 K (indbound clamps to 1),
         layers down to 155 K (jt clamps low), dry (colh2o -> 0,
         specparm -> 0 side, p**4 eta correction low branch)
  col 1: hot/humid extreme — tsfc 345 K (indbound clamps to 180),
         5% water vapor (specparm -> oneminus clamp, self/foreign
         continuum index tops), surface pressure 1100 mb (jp=1 edge)
  col 2: deep stratosphere-only — pressures 3e-3..0.5 mb (below the
         pref table bottom: jp clamps to 58, pure upper-atmosphere
         region), zero trace gases (all 1e-32*coldry floors taken),
         N2O/CO2/CO over-abundance adjustment branches off
  col 3: over-abundant minors — 50x N2O, 10x CO2, CO present
         (adjustment branches on, bands 3/5/6/7/8/9/13)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oracle import rt as ort
from oracle import spec as osp

from rrtmg_lw_tpu.config import LWConfig
from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.models.radiation import RRTMGLW
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.tables import build_lookup_tables
from rrtmg_lw_tpu.types import Atmosphere

NLAY = 31


def _col(plev_sfc, plev_top, tsfc, tshape, h2o, co2=3.55e-4,
         o3=3e-7, n2o=3.2e-7, co=0.0, ch4=1.7e-6, o2=0.209):
    lev = np.linspace(0.0, 1.0, NLAY + 1)
    plev = plev_sfc * (plev_top / plev_sfc) ** lev
    play = np.sqrt(plev[:-1] * plev[1:])                 # log-mid
    tlev = tshape(np.log(plev / plev_sfc))
    tlay = 0.5 * (tlev[:-1] + tlev[1:])
    ones = np.ones(NLAY)
    return dict(play=play, plev=plev, tlay=tlay, tlev=tlev,
                tsfc=tsfc, h2ovmr=h2o * ones, co2vmr=co2 * ones,
                o3vmr=o3 * ones, n2ovmr=n2o * ones, covmr=co * ones,
                ch4vmr=ch4 * ones, o2vmr=o2 * ones)


def make_extreme_atmosphere():
    cols = [
        _col(1013.0, 0.05, 150.0,
             lambda x: np.clip(155.0 - 2.0 * x, 150.0, 200.0),
             h2o=1e-10),
        _col(1100.0, 0.05, 345.0,
             lambda x: np.clip(345.0 + 15.0 * x, 200.0, 345.0),
             h2o=0.05),
        _col(0.5, 3e-3, 250.0,
             lambda x: 230.0 - 5.0 * x,
             h2o=3e-6, co2=0.0, o3=0.0, n2o=0.0, ch4=0.0, o2=0.0),
        _col(1013.0, 0.05, 288.0,
             lambda x: np.clip(288.0 + 6.0 * x, 210.0, 288.0),
             h2o=3e-3, co2=3.55e-3, n2o=1.6e-5, co=5e-6),
    ]
    B = len(cols)
    stack = {k: jnp.asarray(np.stack([c[k] for c in cols]))
             for k in cols[0]}
    zeros = jnp.zeros((B, NLAY))
    return Atmosphere(
        tsfc=jnp.asarray([c["tsfc"] for c in cols]),
        cfc11vmr=zeros + 2.5e-10, cfc12vmr=zeros + 5e-10,
        cfc22vmr=zeros + 1e-10, ccl4vmr=zeros + 1e-10,
        emis=jnp.full((B, 16), 0.95),
        tauaer=jnp.zeros((B, NLAY, 16)),
        **{k: v for k, v in stack.items() if k != "tsfc"})


@pytest.fixture(scope="module")
def setup():
    atm = make_extreme_atmosphere()
    prof = inatm(atm)
    static = kt.load_static()
    ktab, _ = kt.load_ktables()
    model = RRTMGLW(LWConfig(icld=0))
    luts_np = build_lookup_tables()
    oracle_luts = dict(tau_tbl=luts_np.tau_tbl, exp_tbl=luts_np.exp_tbl,
                       tfn_tbl=luts_np.tfn_tbl, delwave=static["delwave"])
    return atm, prof, static, ktab, model, oracle_luts


def _oracle_sc(prof, static, c):
    return osp.setcoef_1col(
        NLAY, np.asarray(prof.pavel[c]), np.asarray(prof.tavel[c]),
        np.asarray(prof.tz[c]), float(prof.tbound[c]),
        np.asarray(prof.semiss[c]), np.asarray(prof.coldry[c]),
        np.asarray(prof.wkl[c]).T, np.asarray(prof.wbrodl[c]), static)


def test_clamps_are_actually_hit(setup):
    """The fixture must keep exercising the edges it claims to."""
    _, prof, static, *_ = setup
    scs = [_oracle_sc(prof, static, c) for c in range(4)]
    assert min(s["jt"].min() for s in scs) == 1
    assert max(s["jt"].max() for s in scs) == 4
    assert scs[2]["jp"].max() == 58          # below-table pressures
    assert scs[1]["jp"].min() == 1           # 1100 mb surface
    assert scs[1]["indself"].max() == 9
    assert scs[0]["indself"].min() == 1
    assert scs[2]["laytrop"] == 0            # pure upper atmosphere
    assert scs[0]["laytrop"] > 0


def test_setcoef_extremes_match_oracle(setup):
    atm, prof, static, ktab, model, _ = setup
    sc = setcoef(prof, model.static, istart=1, idrv=0)
    for c in range(4):
        o = _oracle_sc(prof, static, c)
        assert int(sc.laytrop_mask[c].sum()) == o["laytrop"]
        lt = o["laytrop"]
        for name in ("jp", "jt", "jt1", "indfor", "indminor"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sc, name)[c]) + 1, o[name],
                err_msg=f"{name} c={c}")
        # indself/selffrac are lower-region-only (stale above laytrop)
        np.testing.assert_array_equal(
            np.asarray(sc.indself[c][:lt]) + 1, o["indself"][:lt],
            err_msg=f"indself c={c}")
        np.testing.assert_allclose(np.asarray(sc.selffrac[c][:lt]),
                                   o["selffrac"][:lt], rtol=1e-12)
        for name in ("fac00", "fac01", "fac10", "fac11", "selffac",
                     "forfac", "forfrac", "minorfrac",
                     "colh2o", "colco2", "colo3", "coln2o", "colco",
                     "colch4", "colbrd", "scaleminorn2"):
            np.testing.assert_allclose(
                np.asarray(getattr(sc, name)[c]), o[name],
                rtol=1e-12, atol=1e-30, err_msg=f"{name} c={c}")
        np.testing.assert_allclose(np.asarray(sc.planklay[c]),
                                   o["planklay"], rtol=1e-12)


def test_taumol_extremes_match_oracle(setup):
    atm, prof, static, ktab, model, _ = setup
    sc = setcoef(prof, model.static, istart=1, idrv=0)
    taug, fracs = model.engine(sc, prof)
    for c in range(4):
        o_sc = _oracle_sc(prof, static, c)
        o_taug, o_fracs = osp.taumol_1col(
            NLAY, o_sc, np.asarray(prof.pavel[c]),
            np.asarray(prof.wx[c]).T, np.asarray(prof.coldry[c]),
            ktab, static)
        scale = np.maximum(np.abs(o_taug), 1e-12)
        rel = np.abs(np.asarray(taug[c]) - o_taug) / scale
        assert rel.max() < 1e-11, f"taug col {c}: {rel.max()}"
        np.testing.assert_allclose(np.asarray(fracs[c]), o_fracs,
                                   rtol=1e-12, atol=1e-15)


def test_clear_rt_extremes_match_oracle(setup):
    atm, prof, static, ktab, model, luts = setup
    fl = model(atm)
    sc = setcoef(prof, model.static, istart=1, idrv=0)
    for c in range(4):
        o_sc = _oracle_sc(prof, static, c)
        o_taug, o_fracs = osp.taumol_1col(
            NLAY, o_sc, np.asarray(prof.pavel[c]),
            np.asarray(prof.wx[c]).T, ktab=ktab,
            coldry=np.asarray(prof.coldry[c]), static=static)
        o = ort.rtrnmc_1col(
            NLAY, np.asarray(prof.pz[c]), np.asarray(prof.semiss[c]),
            np.asarray(static["ngb"]) - 1,
            np.zeros((140, NLAY)), np.zeros((140, NLAY)),
            o_sc["planklay"], o_sc["planklev"], o_sc["plankbnd"],
            float(prof.pwvcm[c]), o_fracs, o_taug, luts,
            model.heatfac)
        np.testing.assert_allclose(np.asarray(fl.uflx[c]),
                                   o["totuflux"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(fl.dflx[c]),
                                   o["totdflux"], rtol=1e-10, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fl.hr[c]),
                                   o["htr"][:NLAY], rtol=1e-9, atol=1e-9)
