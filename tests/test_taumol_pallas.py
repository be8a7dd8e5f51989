"""Pallas taumol kernel vs the XLA reference engine (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_atmosphere

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.taumol_pallas import PallasTaumol

pytestmark = pytest.mark.slow  # interpret-mode Pallas (VERDICT r4 #5)


@pytest.fixture(scope="module")
def setup():
    model = make_model(LWConfig(icld=0, dtype="float32",
                                taumol_impl="xla"))
    atm = make_atmosphere(ncol=8, nlay=43, dtype=jnp.float32)
    prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
    sc = jax.jit(lambda p: setcoef(p, model.static, istart=1,
                                   idrv=0))(prof)
    return model, prof, sc


def test_kernel_matches_engine(setup):
    model, prof, sc = setup
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True)
    tg, fr = pt(sc, prof)
    rt, rf = jax.jit(lambda s, p: model.engine(s, p))(sc, prof)
    # fracs bit-exact; taug within f32 rounding (cancellation-heavy
    # extrapolation cells can differ by ~1 ulp of the largest term)
    np.testing.assert_array_equal(np.asarray(fr), np.asarray(rf))
    np.testing.assert_allclose(np.asarray(tg), np.asarray(rt),
                               atol=5e-6, rtol=5e-5)


def test_kernel_pads_ragged_batch(setup):
    model, prof, sc = setup
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True,
                      tile=128)
    # 8*43 = 344 cells -> pads to 384
    tg, fr = pt(sc, prof)
    assert tg.shape == (8, 43, 140)
    assert np.isfinite(np.asarray(tg)).all()


def test_blocked_layout_matches_native(setup):
    model, prof, sc = setup
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True,
                      tile=8)   # B=8 -> one tile per layer
    tg_n, fr_n = pt._forward_native(sc, prof)      # (140, L, B)
    tg_b, fr_b = pt._forward_blocked(sc, prof)     # (L, 144, B)
    assert tg_b.shape == (43, 144, 8)
    # the blocked kernel contracts a windowed key table: identical
    # bf16 values at different K positions, so the MXU accumulation
    # order differs by <= 1-2 f32 ulp from the flat kernel
    np.testing.assert_allclose(
        np.asarray(tg_b[:, :140]),
        np.asarray(tg_n).transpose(1, 0, 2), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(fr_b[:, :140]), np.asarray(fr_n).transpose(1, 0, 2))
    # padded g rows are exact zeros (RT kernel relies on this)
    assert not np.asarray(tg_b[:, 140:]).any()
    assert not np.asarray(fr_b[:, 140:]).any()


def _band_slices():
    from rrtmg_lw_tpu.ops.taumol import NG
    ofs = np.concatenate([[0], np.cumsum(NG)])
    return {b: slice(ofs[b - 1], ofs[b]) for b in range(1, 17)}


def test_minor_adjustment_chi_slot(setup):
    """Over-abundant minor gases (ratio > threshold) must take the
    adjustment branch with the reference's chi_mls(gas, jp+1) slot
    (taumol.f90:548): a +1 slot error shifts adjcol by one pressure
    level and diverges from the XLA engine in bands 3/6/7/8/9/13."""
    model, prof, _ = setup
    # boost CO2/N2O/CH4 (wkl gases 1/3/5) past the over-abundance
    # thresholds; coldry is unchanged so chi ratios scale directly
    boost = np.ones(prof.wkl.shape[-1])
    boost[1], boost[3], boost[5] = 8.0, 50.0, 20.0
    prof_b = prof._replace(wkl=prof.wkl * boost)
    sc_b = jax.jit(lambda p: setcoef(p, model.static, istart=1,
                                     idrv=0))(prof_b)
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True)
    tg, _ = pt(sc_b, prof_b)
    rt, _ = jax.jit(lambda s, p: model.engine(s, p))(sc_b, prof_b)
    tg, rt = np.asarray(tg), np.asarray(rt)
    for b, sl in _band_slices().items():
        scale = max(np.abs(rt[..., sl]).max(), 1e-30)
        err = np.abs(tg[..., sl] - rt[..., sl]).max() / scale
        assert err < 2e-5, (b, err)


def test_band16_upper_nspb0_quirk(setup):
    """Band 16 upper atmosphere: nspb(16)=0 pins ind0=ind1=1
    (rrtmg_lw_init.f90:228, taumol.f90:195-196), so taug must use absb
    rows 1/2 for EVERY upper layer — not a pressure-indexed lookup."""
    model, prof, sc = setup
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True)
    tg, _ = pt(sc, prof)
    rt, _ = jax.jit(lambda s, p: model.engine(s, p))(sc, prof)
    upper = ~np.asarray(sc.laytrop_mask)
    assert upper.any()
    sl = _band_slices()[16]
    a = np.asarray(rt)[upper][:, sl]
    b = np.asarray(tg)[upper][:, sl]
    scale = max(np.abs(a).max(), 1e-30)
    assert np.abs(a - b).max() / scale < 1e-5


def test_window_ok_flag(setup):
    model, prof, sc = setup
    pt = PallasTaumol(model.ktables, model.static_np, interpret=True,
                      tile=8)
    # normal atmosphere: every layer-tile's jp spread fits the window
    ok = pt.window_ok(sc)
    assert ok.shape == (sc.jp.shape[0],) and bool(ok.all())
    # absurd batch: columns 0/1 of the same layer 12 pressure slots
    # apart -> rows clamp, the affected columns' flags go False
    jp_wide = sc.jp.at[0].set(0).at[1].set(12)
    ok = pt.window_ok(sc._replace(jp=jp_wide))
    assert not bool(ok.all())
    assert not ok[0] and not ok[1]


def test_logu16_spec_codec_roundtrip():
    """RRTMG_SPEC_DTYPE=logu16 codec (round 5): uniform 3.4e-4
    relative step over the flux-relevant od range, exact zero
    sentinel, fracs linear at 1.5e-5.  On-chip A/B
    (SPEC_DTYPE_AB.json): flux parity 7.8e-6 relative — inside the
    3.1e-5 tpu_verify tolerance (bf16 was 9x over) — but the codec's
    VPU cost exceeds the HBM saving on a v5e (~-1 ms/step), so the
    knob's value is HBM *capacity* (2.3 -> 1.15 GB/step), not speed."""
    import numpy as np
    from rrtmg_lw_tpu.ops.taumol_pallas import (spec_decode_frac,
                                                spec_decode_taug,
                                                spec_encode_frac,
                                                spec_encode_taug)
    x = jnp.asarray(np.concatenate([
        [0.0, -1e-9, 5e-10, 1e-9],        # sentinel region
        np.geomspace(2e-9, 3.9, 4000)]).astype(np.float32))
    u = spec_encode_taug(x)
    y = np.asarray(spec_decode_taug(u))
    xs = np.asarray(x)
    assert (y[xs <= 1e-9] == 0.0).all()
    big = xs > 2e-9
    rel = np.abs(y[big] / xs[big] - 1.0)
    assert rel.max() < 4e-4, rel.max()

    f = jnp.asarray(np.linspace(0.0, 1.0, 1000, dtype=np.float32))
    fd = np.asarray(spec_decode_frac(spec_encode_frac(f)))
    assert np.abs(fd - np.asarray(f)).max() < 1.6e-5
