"""Gradient-path machinery for the Pallas taumol kernel (round 5).

Three backward implementations exist (RRTMG_TAUMOL_BWD):
  pallas (default) — in-kernel jax.vjp over the per-tile band
      evaluation (VMEM-resident; measured 4.7 ms at B=4096 on a v5e
      vs 345 ms for the engine-replay path it replaced);
  twin — column-chunked vjp of forward_xla, the kernel math restated
      in differentiable XLA (one-hot MXU selections, no gathers);
  engine — vjp of the f64-parity gather engine (original path).

These tests pin: (a) forward_xla reproduces the kernel, (b) all three
backwards agree on d(loss)/d(atmosphere), (c) the column-chunked vjp
helper is exact vs the unchunked vjp.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.models.radiation import RRTMGLW
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.taumol_pallas import PallasTaumol
from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                          make_mcica_clouds)

pytestmark = pytest.mark.slow  # interpret-mode Pallas (VERDICT r4 #5)

B, L = 16, 51


@pytest.fixture(scope="module")
def env():
    m = RRTMGLW(LWConfig(icld=0, dtype="float32", use_lut=False))
    atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
    prof = inatm(atm, dtype=jnp.float32)
    sc = setcoef(prof, m.static, istart=1, idrv=0)
    pt = PallasTaumol(m.ktables, m.static_np, interpret=True)
    return m, atm, prof, sc, pt


def test_forward_xla_matches_kernel(env):
    m, atm, prof, sc, pt = env
    tg_x, fr_x = jax.jit(pt.forward_xla)(sc, prof)
    tg_k, fr_k = pt.forward_native(sc, prof)
    # same split-bf16 tables and op structure, but XLA vs interpret
    # dot ordering differs at f32 rounding; cancellation in small taug
    # sums amplifies that to ~1e-4 relative worst-case
    rel = (np.abs(np.asarray(tg_x) - np.asarray(tg_k))
           / (np.abs(np.asarray(tg_k)) + 1e-12)).max()
    assert rel < 5e-4, rel
    assert np.abs(np.asarray(fr_x) - np.asarray(fr_k)).max() < 1e-6


def _grad(mode):
    model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                                use_lut=False, taumol_impl="pallas",
                                rt_impl="pallas",
                                pallas_interpret=True))
    atm = jax.tree_util.tree_map(
        jnp.asarray, make_atmosphere(ncol=B, nlay=L,
                                     dtype=jnp.float32))
    clouds = jax.tree_util.tree_map(
        jnp.asarray, make_mcica_clouds(ncol=B, nlay=L,
                                       dtype=jnp.float32,
                                       layout="compact"))

    def loss(a, c):
        fl = model(a, c)
        return (fl.hr ** 2).mean() + (fl.uflx[:, -1] ** 2).mean()

    old = os.environ.get("RRTMG_TAUMOL_BWD")
    os.environ["RRTMG_TAUMOL_BWD"] = mode
    try:
        g = jax.grad(loss)(atm, clouds)
    finally:
        if old is None:
            os.environ.pop("RRTMG_TAUMOL_BWD", None)
        else:
            os.environ["RRTMG_TAUMOL_BWD"] = old
    return g


def test_pallas_and_twin_backwards_match_engine(env):
    g_eng = _grad("engine")
    for mode in ("pallas", "twin"):
        g = _grad(mode)
        for name in ("tlay", "tsfc", "h2ovmr", "co2vmr", "play",
                     "o3vmr"):
            a = np.asarray(getattr(g, name))
            b = np.asarray(getattr(g_eng, name))
            assert np.isfinite(a).all(), (mode, name)
            scale = np.abs(b).max() + 1e-30
            # the kernel-linearizing backwards differ from the exact-
            # table engine linearization at the bf16-split level
            assert np.abs(a - b).max() / scale < 2e-2, (mode, name)


def test_chunked_vjp_exact():
    from rrtmg_lw_tpu.ops._vjp_chunk import chunked_vjp

    def f(x, idx, y):
        # mixes float and int leaves; per-column along axis 0 of x,
        # axis 1 of y
        return (x ** 2 * idx.astype(x.dtype)).T + jnp.sin(y)

    k = jax.random.key(0)
    x = jax.random.normal(k, (8, 5))
    idx = jnp.arange(40, dtype=jnp.int32).reshape(8, 5)
    y = jax.random.normal(jax.random.key(1), (5, 8))
    ct = jnp.ones((5, 8))
    args = (x, idx, y)
    axes = (0, 0, 1)
    ref = jax.vjp(f, *args)[1](ct)
    got = chunked_vjp(f, args, ct, axes, 1, 4)
    for r, g in zip(ref, got):
        if r.dtype == jax.dtypes.float0:
            assert g.dtype == jax.dtypes.float0
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6)


def test_grad_finite_at_adjusted_col_threshold(env):
    """The double-where pow guard: columns sitting exactly at the
    over-abundance threshold (ratio == base) must yield finite
    gradients through every backward mode (a single where/maximum
    would leak NaN via inf * 0)."""
    g = _grad("pallas")
    for name in ("n2ovmr", "ch4vmr", "co2vmr"):
        assert np.isfinite(np.asarray(getattr(g, name))).all(), name


def _grad_rt(mode, B=128, L=14, cloudy=True):
    cfg = dict(dtype="float32", use_lut=False, taumol_impl="pallas",
               rt_impl="pallas", pallas_interpret=True)
    model = make_model(LWConfig(icld=2 if cloudy else 0,
                                imca=1 if cloudy else 0, **cfg))
    atm = jax.tree_util.tree_map(
        jnp.asarray, make_atmosphere(ncol=B, nlay=L,
                                     dtype=jnp.float32))
    clouds = jax.tree_util.tree_map(
        jnp.asarray, make_mcica_clouds(
            ncol=B, nlay=L, dtype=jnp.float32,
            layout="compact")) if cloudy else None

    def loss(a, c):
        fl = model(a, c)
        return (fl.hr ** 2).mean() + (fl.uflx[:, -1] ** 2).mean()

    old = os.environ.get("RRTMG_RT_BWD")
    os.environ["RRTMG_RT_BWD"] = mode
    try:
        g = jax.grad(loss)(atm, clouds)
    finally:
        if old is None:
            os.environ.pop("RRTMG_RT_BWD", None)
        else:
            os.environ["RRTMG_RT_BWD"] = old
    return g


@pytest.mark.parametrize("cloudy", [True, False])
def test_rt_unrolled_bwd_matches_scan_bwd(cloudy):
    """The unrolled column-chunked RT backward (rtrn_bwd.py — the
    production grad path, 8.8x the round-5 first measurement) agrees
    with the scan-based XLA vjp.  Both are f32 linearizations of the
    same sweep; the one-division tf form and reassociation leave
    ~1e-3 relative noise on small components (function-level f64-ish
    check in the round-5 log: primal 1e-7, taut/fracs grads 8e-7)."""
    g_new = _grad_rt("unrolled", cloudy=cloudy)
    g_ref = _grad_rt("xla", cloudy=cloudy)
    # emis flows through the surface-reflection chain whose cotangent
    # accumulates over every up-sweep level — tree-sum vs scan-order
    # f32 accumulation leaves ~2e-3 function-level noise (round-5
    # log) that the squared-loss chain amplifies to a few percent on
    # this small batch; the physically dominant gradients hold 5e-2
    tols = {"emis": 1.5e-1}
    for name in ("tlay", "tlev", "tsfc", "h2ovmr", "co2vmr", "o3vmr",
                 "play", "emis"):
        a = np.asarray(getattr(g_new, name))
        b = np.asarray(getattr(g_ref, name))
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-30
        assert np.abs(a - b).max() / scale < tols.get(name, 5e-2), (
            cloudy, name, np.abs(a - b).max() / scale)
