"""planck_pallas vs the setcoef reference interpolation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.ops.planck_pallas import planck_interp_blocked
from rrtmg_lw_tpu.ops.setcoef import _interp_planck, _planck_index

pytestmark = pytest.mark.slow  # interpret-mode Pallas (VERDICT r4 #5)


@pytest.fixture(scope="module")
def totplnk():
    return np.asarray(kt.load_static()["totplnk"], np.float32)


def test_matches_setcoef_interp(totplnk):
    rng = np.random.default_rng(0)
    B, L = 256, 7
    # span the table including the clamped extrapolation ends
    temps = rng.uniform(155.0, 345.0, size=(B, L)).astype(np.float32)

    ind, frac = _planck_index(jnp.asarray(temps))
    ref = _interp_planck(jnp.asarray(totplnk), ind, frac)   # (B, L, 16)

    out = planck_interp_blocked(jnp.asarray(temps.T), totplnk,
                                tile=128, interpret=True)   # (L, 16, B)
    got = jnp.transpose(out, (2, 0, 1))
    # the binary one-hot taps select exact f32 table rows (truncated
    # 3-level bf16 split) and the interpolation runs post-dot in the
    # same f32 form as _interp_planck: equal to ~1 ulp (the residue is
    # compiler fma-fusion of the final a+f*(b-a), not the selection —
    # the old fraction-weighted bf16 W was only ~2^-17)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-7, atol=0)
