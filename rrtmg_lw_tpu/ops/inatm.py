"""GCM input adapter: vmr -> molecular column amounts.

Vectorized equivalent of ``inatm`` (rrtmg_lw_rad.f90:598-924): hydrostatic
dry-air column, broadening-gas column, precipitable water, and the 1e-20
scaling of cross-section (CFC/CCl4) amounts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import AMD, AMW, AVOGAD, GRAV
from ..types import Atmosphere, Profile


def inatm(atm: Atmosphere, dtype=jnp.float64) -> Profile:
    play = atm.play.astype(dtype)
    plev = atm.plev.astype(dtype)
    tlay = atm.tlay.astype(dtype)
    tlev = atm.tlev.astype(dtype)

    h2o = atm.h2ovmr.astype(dtype)
    # molecular weight of moist air, per layer (rrtmg_lw_rad.f90:807)
    amm = (1.0 - h2o) * AMD + h2o * AMW
    dp = plev[:, :-1] - plev[:, 1:]                    # (B, L), positive
    coldry = dp * 1.0e3 * AVOGAD / (1.0e2 * GRAV * amm * (1.0 + h2o))

    vmr = jnp.stack(
        [h2o, atm.co2vmr, atm.o3vmr, atm.n2ovmr, atm.covmr,
         atm.ch4vmr, atm.o2vmr], axis=-1).astype(dtype)  # (B, L, 7)
    summol = vmr[..., 1:].sum(axis=-1)
    wbrodl = coldry * (1.0 - summol)
    wkl = coldry[..., None] * vmr

    wx_vmr = jnp.stack(
        [atm.ccl4vmr, atm.cfc11vmr, atm.cfc12vmr, atm.cfc22vmr],
        axis=-1).astype(dtype)
    wx = coldry[..., None] * wx_vmr * 1.0e-20

    amttl = (coldry + wkl[..., 0]).sum(axis=-1)        # (B,)
    wvttl = wkl[..., 0].sum(axis=-1)
    wvsh = (AMW * wvttl) / (AMD * amttl)
    pwvcm = wvsh * (1.0e3 * plev[:, 0]) / (1.0e2 * GRAV)

    return Profile(
        pavel=play, tavel=tlay, pz=plev, tz=tlev,
        tbound=atm.tsfc.astype(dtype), semiss=atm.emis.astype(dtype),
        coldry=coldry, wkl=wkl, wbrodl=wbrodl, wx=wx, pwvcm=pwvcm,
        taua=atm.tauaer.astype(dtype))
