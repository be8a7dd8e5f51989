"""McICA generator: exact-RNG known-answer tests + overlap statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.ops import mcica


def test_mt19937_known_answer():
    # Published genrand_int32 outputs for init_genrand(5489) — the
    # reference initialize_scalar (mcica_random_numbers.f90:172-189) is
    # the standard init_genrand.
    mt = mcica.MersenneTwisterRef(5489)
    got = [int(mt.random_int32()) for _ in range(5)]
    assert got == [3499211612, 581869302, 3890346734, 3586334585,
                   545404204]


def test_mt_random_real_range_and_determinism():
    mt1 = mcica.MersenneTwisterRef(7)
    mt2 = mcica.MersenneTwisterRef(7)
    a = [mt1.random_real() for _ in range(1000)]
    b = [mt2.random_real() for _ in range(1000)]
    assert a == b
    assert all(0.0 <= x <= 1.0 for x in a)
    assert abs(np.mean(a) - 0.5) < 0.05


def test_kissvec_matches_scalar_semantics():
    pm = np.array([101325.33, 95000.77, 90000.19, 85000.91])
    k1 = mcica.KissVecRef(pm[None, :])
    k2 = mcica.KissVecRef(np.vstack([pm, pm]))
    a = [float(k1.draw()[0]) for _ in range(50)]
    b2 = [k2.draw() for _ in range(50)]
    assert a == [float(x[0]) for x in b2]
    assert a == [float(x[1]) for x in b2]
    assert all(0.0 <= x <= 1.0 for x in a)


def _column():
    L = 20
    cldfrac = np.zeros(L)
    cldfrac[4:8] = 0.6
    cldfrac[12:14] = 0.3
    clwp = np.where(cldfrac > 0, 30.0, 0.0)
    ciwp = np.where(cldfrac > 0, 5.0, 0.0)
    pmid = 101325.33 * np.exp(-np.arange(L) / 7.0) + 0.123456
    tauc = np.zeros((16, L))
    return L, cldfrac, clwp, ciwp, pmid, tauc


@pytest.mark.parametrize("icld", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("irng", [0, 1])
def test_reference_generator_runs_all_overlaps(icld, irng):
    static = kt.load_static()
    L, cldfrac, clwp, ciwp, pmid, tauc = _column()
    alpha = np.full(L, 0.8)
    alpha[0] = 0.0
    out = mcica.generate_stochastic_clouds_ref(
        L, icld, irng, pmid, cldfrac, clwp, ciwp, alpha, tauc,
        changeseed=1, ngb=static["ngb"])
    cldfmc = out["cldfmc"]
    assert cldfmc.shape == (140, L)
    assert set(np.unique(cldfmc)) <= {0.0, 1.0}
    # clear layers stay clear; mean cloudy fraction approximates cldfrac
    assert cldfmc[:, 0].sum() == 0
    m = cldfmc[:, 4:8].mean()
    assert abs(m - 0.6) < 0.15
    # water only where cloudy
    assert np.all((out["clwpmc"] > 0) <= (cldfmc == 1.0))


def test_reference_generator_mt_deterministic_per_seed():
    static = kt.load_static()
    L, cldfrac, clwp, ciwp, pmid, tauc = _column()
    a = mcica.generate_stochastic_clouds_ref(
        L, 2, 1, pmid, cldfrac, clwp, ciwp, None, tauc, 3, static["ngb"])
    b = mcica.generate_stochastic_clouds_ref(
        L, 2, 1, pmid, cldfrac, clwp, ciwp, None, tauc, 3, static["ngb"])
    c = mcica.generate_stochastic_clouds_ref(
        L, 2, 1, pmid, cldfrac, clwp, ciwp, None, tauc, 4, static["ngb"])
    np.testing.assert_array_equal(a["cldfmc"], b["cldfmc"])
    assert not np.array_equal(a["cldfmc"], c["cldfmc"])


@pytest.mark.parametrize("icld", [1, 2, 3, 4, 5])
def test_native_generator_statistics(icld):
    static = kt.load_static()
    B, L = 64, 20
    cldfrac = np.zeros((B, L))
    cldfrac[:, 4:8] = 0.6
    cldfrac[:, 12:14] = 0.3
    clwp = np.where(cldfrac > 0, 30.0, 0.0)
    ciwp = np.zeros((B, L))
    rei = np.full((B, L), 30.0)
    rel = np.full((B, L), 10.0)
    tauc = np.zeros((B, L, 16))
    alpha = np.full((B, L), 0.8)
    alpha[:, 0] = 0.0
    out = mcica.mcica_subcol_lw(
        jax.random.PRNGKey(0), icld, jnp.asarray(cldfrac),
        jnp.asarray(ciwp), jnp.asarray(clwp), jnp.asarray(rei),
        jnp.asarray(rel), jnp.asarray(tauc), jnp.asarray(alpha),
        ngb=static["ngb"])
    cldfmc = np.asarray(out.cldfmc)
    assert cldfmc.shape == (B, L, 140)
    # per-layer cloudy fraction converges to cldfrac over B*140 samples
    frac = cldfmc.mean(axis=(0, 2))
    np.testing.assert_allclose(frac[4:8], 0.6, atol=0.02)
    np.testing.assert_allclose(frac[12:14], 0.3, atol=0.02)
    assert frac[0] == 0.0 and frac[-1] == 0.0
    if icld == 3:
        # maximum overlap: cloud mask identical at every cloudy level of
        # the thick deck (same random number at every level)
        deck = cldfmc[:, 4:8, :]
        assert np.all(deck == deck[:, :1, :])


@pytest.mark.parametrize("icld,within,across", [
    # expected joint cloudy fraction for ADJACENT cloudy layers at
    # c=0.6 ("within" a contiguous deck) and for two decks SEPARATED
    # by clear sky ("across"):
    #   random:            c1*c2 everywhere            = 0.36
    #   maximum-random:    min(c1,c2) within, c1*c2 across
    #   maximum:           min(c1,c2) everywhere       = 0.6
    #   exponential a=0.8: a*min + (1-a)*c1*c2 within  = 0.552
    (1, 0.36, 0.36),
    (2, 0.60, 0.36),
    (3, 0.60, 0.60),
    (5, 0.552, None),       # across-gap value depends on alpha chain
])
def test_native_generator_pairwise_overlap(icld, within, across):
    """The overlap MODELS differ only in the joint distribution of
    adjacent layers (mcica_subcol_gen_lw.f90:484-645) — the per-layer
    fraction test alone cannot tell them apart."""
    static = kt.load_static()
    B, L = 256, 9
    c = 0.6
    cldfrac = np.zeros((B, L))
    cldfrac[:, 1:3] = c          # deck 1: layers 1-2
    cldfrac[:, 5:7] = c          # deck 2, separated by clear 3-4
    clwp = np.where(cldfrac > 0, 30.0, 0.0)
    zeros = np.zeros((B, L))
    alpha = np.full((B, L), 0.8)
    out = mcica.mcica_subcol_lw(
        jax.random.PRNGKey(3), icld, jnp.asarray(cldfrac),
        jnp.asarray(zeros), jnp.asarray(clwp),
        jnp.asarray(np.full((B, L), 30.0)),
        jnp.asarray(np.full((B, L), 10.0)),
        jnp.asarray(np.zeros((B, L, 16))), jnp.asarray(alpha),
        ngb=static["ngb"])
    m = np.asarray(out.cldfmc) > 0.5             # (B, L, 140)
    joint_within = (m[:, 1, :] & m[:, 2, :]).mean()
    np.testing.assert_allclose(joint_within, within, atol=0.02)
    if across is not None:
        joint_across = (m[:, 2, :] & m[:, 5, :]).mean()
        np.testing.assert_allclose(joint_across, across, atol=0.02)


def test_get_alpha_exponential_random():
    B, L = 3, 10
    dz = np.full((B, L), 500.0)
    cldfrac = np.zeros((B, L))
    cldfrac[:, 2:4] = 0.5        # block then clear at 4
    a5 = np.asarray(mcica.get_alpha(jnp.asarray(dz), 5, idcor=0,
                                    decorr_con=2.5e3,
                                    cldfrac=jnp.asarray(cldfrac)))
    assert a5[0, 0] == 0.0
    np.testing.assert_allclose(a5[0, 1], np.exp(-500.0 / 2.5e3))
    assert a5[0, 4] == 0.0       # decorrelated after block end
    # latitude-varying decorrelation (Oreopolous et al. 2012)
    a4 = np.asarray(mcica.get_alpha(
        jnp.asarray(dz), 4, idcor=1, lat=np.array([0.0, 45.0, -60.0]),
        juldat=200, cldfrac=jnp.asarray(cldfrac)))
    assert np.all(a4[:, 1:] > 0) and np.all(a4[:, 1:] < 1)
    assert not np.allclose(a4[0, 1], a4[2, 1])


def test_compact_generator_statistics():
    """mcica_subcol_lw_compact: per-layer cloudy fraction matches the
    input cloud fraction statistically, icld=3 masks are level-uniform,
    and the output feeds the compact model path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rrtmg_lw_tpu.ops import mcica
    from rrtmg_lw_tpu.types import McicaCloudsCompact

    B, L = 64, 12
    rng = np.random.default_rng(3)
    cldfrac = jnp.asarray(np.clip(rng.random((B, L)), 0.05, 0.95),
                          jnp.float64)
    ciwp = jnp.full((B, L), 5.0)
    clwp = jnp.full((B, L), 20.0)
    rei = jnp.full((B, L), 30.0)
    rel = jnp.full((B, L), 10.0)
    key = jax.random.PRNGKey(11)

    for icld in (1, 2, 3):
        cl = mcica.mcica_subcol_lw_compact(key, icld, cldfrac, ciwp,
                                           clwp, rei, rel)
        assert isinstance(cl, McicaCloudsCompact)
        assert cl.cldfmc.shape == (L, 144, B)
        # pad rows zero
        assert not np.asarray(cl.cldfmc[:, 140:]).any()
        frac = np.asarray(cl.cldfmc[:, :140, :]).mean(axis=1).T  # (B,L)
        # binomial(140) 4-sigma envelope
        sig = np.sqrt(np.asarray(cldfrac) * (1 - np.asarray(cldfrac))
                      / 140.0)
        assert (np.abs(frac - np.asarray(cldfrac)) < 4.5 * sig + 1e-9
                ).mean() > 0.99
        if icld == 3:
            # maximum overlap: one draw broadcast over levels -> the
            # mask is cloudy wherever cldfrac exceeds the draw
            m = np.asarray(cl.cldfmc[:, :140, :])
            # monotone in cldfrac along layers for fixed (g, col)
            cf = np.asarray(cldfrac).T[:, None, :]
            order = np.argsort(cf, axis=0)
            ms = np.take_along_axis(np.broadcast_to(m, m.shape),
                                    np.broadcast_to(order, m.shape),
                                    axis=0)
            assert (np.diff(ms, axis=0) >= 0).all()
