"""Parity: Pallas cloud-coefficient kernel vs the XLA gather path."""

import numpy as np
import jax.numpy as jnp
import pytest

from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.ops.cldprop import _ice_liq_coeffs
from rrtmg_lw_tpu.ops.cldcoef_pallas import ice_liq_coeffs_blocked

pytestmark = pytest.mark.slow  # interpret-mode Pallas (VERDICT r4 #5)


@pytest.mark.parametrize("iceflag", [2, 3])
def test_cldcoef_pallas_matches_xla(iceflag):
    static = kt.load_static()
    rng = np.random.default_rng(7)
    B, L = 128, 9
    # cover in-range, clamped-low, clamped-high (incl. the nmax edge)
    reic = rng.uniform(0.0, 160.0, (B, L)).astype(np.float32)
    relq = rng.uniform(0.0, 70.0, (B, L)).astype(np.float32)
    reic[0, 0] = 5.0
    reic[0, 1] = 131.0 if iceflag == 2 else 140.0
    relq[0, 2] = 2.5
    relq[0, 3] = 60.0

    abi_ref, abl_ref, ok_ref = _ice_liq_coeffs(
        jnp.asarray(reic), jnp.asarray(relq), iceflag, 1, static,
        jnp.float32)

    abi_t, abl_t = ice_liq_coeffs_blocked(
        jnp.asarray(reic), jnp.asarray(relq), iceflag, 1, static,
        tile=128, interpret=True)

    np.testing.assert_allclose(np.transpose(np.asarray(abi_t), (2, 0, 1)),
                               np.asarray(abi_ref), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.transpose(np.asarray(abl_t), (2, 0, 1)),
                               np.asarray(abl_ref), rtol=0, atol=1e-6)

    rmax = 131.0 if iceflag == 2 else 140.0
    ok = ((reic >= 5.0) & (reic <= rmax)
          & (relq >= 2.5) & (relq <= 60.0))
    np.testing.assert_array_equal(ok, np.asarray(ok_ref))
