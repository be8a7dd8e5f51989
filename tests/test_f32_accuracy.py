"""The production f32 pipeline must stay far inside the reference
accuracy contract (fluxes <= 0.5 W/m², heating <= 0.1 K/day,
README.md:19) relative to the f64 parity path.

Measured on CPU/XLA with the direct-exp scheme (the one the TPU Pallas
kernels use): ~1e-4 W/m² flux and ~6e-3 K/day heating differences at
nlay=60 — the gates below keep two orders of margin on flux.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere, make_mcica_clouds


@pytest.mark.parametrize("icld", [0, 2])
def test_f32_within_contract(icld):
    out = {}
    for dt in ("float64", "float32"):
        jdt = jnp.float64 if dt == "float64" else jnp.float32
        atm = make_atmosphere(ncol=8, nlay=60, dtype=jdt)
        cl = make_mcica_clouds(ncol=8, nlay=60, dtype=jdt) if icld \
            else None
        model = make_model(LWConfig(icld=icld, imca=1, dtype=dt,
                                    use_lut=False))
        out[dt] = model(atm, cl)
    a, b = out["float64"], out["float32"]
    assert np.abs(np.asarray(a.uflx) - np.asarray(b.uflx)).max() < 5e-3
    assert np.abs(np.asarray(a.dflx) - np.asarray(b.dflx)).max() < 5e-3
    assert np.abs(np.asarray(a.hr) - np.asarray(b.hr)).max() < 0.05


def test_deep_profiles_finite():
    """mxlay parity: the reference supports up to 603 layers
    (parrrtm.f90:31); the pipeline must stay finite at that depth
    (regression: the synthetic generator's old 0.03 mb pressure floor
    collapsed top layers to zero thickness at large nlay)."""
    for L in (140, 603):
        atm = make_atmosphere(ncol=2, nlay=L)
        clouds = make_mcica_clouds(ncol=2, nlay=L)
        fl = make_model(LWConfig(icld=2, imca=1))(atm, clouds)
        assert np.isfinite(np.asarray(fl.uflx)).all(), L
        assert np.isfinite(np.asarray(fl.hr)).all(), L
        assert (np.diff(np.asarray(atm.plev), axis=1) < 0.0).all(), L
