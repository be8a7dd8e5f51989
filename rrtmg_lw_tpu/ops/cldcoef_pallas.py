"""Pallas TPU kernel for cloud particle-size coefficient interpolation.

The XLA path (cldprop._ice_liq_coeffs) evaluates the ice/liquid
absorption tables with ``jnp.take`` row gathers over (B, L) indices
(cldprop.py:66,81 — the Key/Streamer, Fu and Hu & Stamnes
parameterizations of rrtmg_lw_cldprmc.f90:210-268).  XLA:TPU lowers
each gather to a kCustom fusion plus layout-conversion copies; measured
~2.5 ms/step at B=4096, L=60 — dominating the whole McICA cloud-optics
stage even though the output is only (B, L, 16).

Here the two-tap row selection is a one-hot matmul against the tiny
resident tables, built entirely in VMEM (same design as
planck_pallas): grid over (layer, column-tile), compute the
index/fraction arithmetic on the VPU, contract (16, 48)x(48, 2T) /
(16, 64)x(64, 2T) on the MXU, fma the two taps, and write the
coefficients directly in the RT sweep kernel's (L, 16, B) blocked
layout (killing the downstream transpose as well).

Numerics: identical f32 operations to the XLA path — the lo/hi taps
are selected by binary one-hots and combined as lo + fint*(hi - lo),
so results match cldprop._ice_liq_coeffs bit-for-bit.  The bounds_ok
diagnostic stays in XLA (cheap elementwise fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KICE = 48           # 43 (absice2) / 46 (absice3) rows padded
KLIQ = 64           # 58 (absliq1) rows padded


@functools.lru_cache(maxsize=8)
def _build(T, nmax_ice, interpret):
    nmax = nmax_ice

    def kernel(ice_ref, liq_ref, reic_ref, relq_ref, oi_ref, ol_ref):
        reic = reic_ref[0]                                # (1, T)
        relq = relq_ref[0]

        # ice: factor = (reic-2)/3, trunc index, nmax clamp
        # (cldprop.py:61-65 / rrtmg_lw_cldprmc.f90:210-224)
        factor = (reic - 2.0) / 3.0
        idx = factor.astype(jnp.int32)
        idx = jnp.where(idx == nmax, nmax - 1, idx)
        idx = jnp.clip(idx, 1, nmax - 1)
        fint = factor - idx.astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (KICE, T), 0)
        W = jnp.concatenate(
            [jnp.where(iota == idx - 1, 1.0, 0.0),
             jnp.where(iota == idx, 1.0, 0.0)], axis=1)   # (KICE, 2T)
        M = jnp.dot(ice_ref[:], W, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        lo, hi = M[:, :T], M[:, T:]
        oi_ref[0] = lo + fint * (hi - lo)

        # liquid: Hu & Stamnes index (cldprop.py:76-83 /
        # rrtmg_lw_cldprmc.f90:258-268)
        idx = (relq - 1.5).astype(jnp.int32)
        idx = jnp.where(idx == 0, 1, idx)
        idx = jnp.where(idx == 58, 57, idx)
        idx = jnp.clip(idx, 1, 57)
        fint = relq - 1.5 - idx.astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (KLIQ, T), 0)
        W = jnp.concatenate(
            [jnp.where(iota == idx - 1, 1.0, 0.0),
             jnp.where(iota == idx, 1.0, 0.0)], axis=1)   # (KLIQ, 2T)
        M = jnp.dot(liq_ref[:], W, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        lo, hi = M[:, :T], M[:, T:]
        ol_ref[0] = lo + fint * (hi - lo)

    def run(ice16, liq16, reic_t, relq_t):                # (L, B) each
        L, B = reic_t.shape
        nb = B // T
        r3 = reic_t.reshape(L * nb, 1, T)
        q3 = relq_t.reshape(L * nb, 1, T)
        row = pl.BlockSpec((1, 1, T), lambda l, i: (l * nb + i, 0, 0),
                           memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 16, T), lambda l, i: (l, 0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((L, 16, B), jnp.float32),
                       jax.ShapeDtypeStruct((L, 16, B), jnp.float32)),
            grid=(L, nb),
            in_specs=[
                pl.BlockSpec((16, KICE), lambda l, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, KLIQ), lambda l, i: (0, 0),
                             memory_space=pltpu.VMEM),
                row, row,
            ],
            out_specs=(ospec, ospec),
            interpret=bool(interpret),
        )(ice16, liq16, r3, q3)

    return run


def ice_liq_coeffs_blocked(reic, relq, iceflag, liqflag, tables, *,
                           tile=512, interpret=False):
    """(B, L) particle sizes -> per-band absorption coefficients in the
    blocked (L, 16, B) layout.  Supports iceflag 2/3 + liqflag 1 (the
    tabulated parameterizations); callers fall back to the XLA path for
    the other (gather-free) flags.  B must be a multiple of ``tile``.
    """
    if iceflag not in (2, 3) or liqflag != 1:
        raise ValueError("pallas cloud coeffs: iceflag 2/3 + liqflag 1")
    B, L = reic.shape
    tile = min(tile, B)
    if B % tile:
        raise ValueError("ice_liq_coeffs_blocked needs tile | B")
    tab = tables["absice2"] if iceflag == 2 else tables["absice3"]
    nmax = 43 if iceflag == 2 else 46
    ice16 = jnp.asarray(np.pad(np.asarray(tab, np.float32).T,
                               ((0, 0), (0, KICE - nmax))))
    liq16 = jnp.asarray(np.pad(np.asarray(tables["absliq1"],
                                          np.float32).T,
                               ((0, 0), (0, KLIQ - 58))))
    run = _build(int(tile), int(nmax), bool(interpret))
    return run(ice16, liq16, reic.T.astype(jnp.float32),
               relq.T.astype(jnp.float32))
