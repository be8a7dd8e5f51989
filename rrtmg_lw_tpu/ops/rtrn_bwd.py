"""Unrolled, column-chunked backward for the random-overlap RT sweep.

The forward RT kernel (rtrn_pallas.py) streams level chunks through a
grid with VMEM scratch carries, which autodiff cannot see through —
so the custom_vjp backward differentiated the XLA twin
(rtrn.rt_random_overlap): a pair of ``lax.scan``s whose transpose
stacks per-level residuals with dynamic-update-slices and runs small
reverse scans — measured as ~63% of a 335 ms grad step at
B=16384/nlay=60 (PERF_NOTES round 5).

This module replaces that replay with an UNROLLED restatement of the
same sweep math (a static Python loop over levels — no scans at all),
evaluated under the column-chunked vjp (ops/_vjp_chunk.py).  XLA then
sees one flat graph per chunk: residuals are plain tensors, the
per-level bodies fuse, and there is no scan-transpose machinery.

Why not in-kernel-vjp like taumol (the round-5 first attempt):
(a) ``jax.checkpoint``'s remat2 primitive does not lower in Mosaic,
so the per-level optics cannot be rematerialized inside a kernel and
the un-remat'd vjp residuals need ~273 MB of VMEM at nlay=60 —
2x the chip's VMEM even at the minimum 128-lane tile; (b) Pallas
requires 128-divisible lane blocks, so the tile cannot shrink
further.  The scalable in-kernel design (grid over level chunks with
cotangent carries in scratch) is recorded in PERF_NOTES as future
work; the unrolled-XLA form already removes the dominant cost.

Supported configuration = the production TPU training path: blocked
native layout, compact fused clouds (binary mask x per-layer water)
or clear sky, blocked Planck rows, idrv=0, f32 spectral storage.
Everything else falls back to the chunked vjp of rtrn.py's scans.

Forward semantics mirrored from rtrn_pallas.py (rtrnmc.f90:350-529):
3-regime gas factors with the shared-exp product and one-division
forms, effective cloud fraction, clear-sky twin stream gated by the
cloud-in-path flag.  The linearization point therefore matches the
kernel's own forward math (the scan twin uses the two-division tf —
a few-ulp primal difference, ~1e-3 relative on small gradient
components; tests gate both against each other loosely).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import FLUXFAC, REC_6, WTDIFF
from .cldprop import CLDMIN

NBANDS = 16
E006 = float(np.exp(-0.06))

# column-chunk target for the unrolled vjp: residuals are ~35 KB per
# (column, 60-level) cell, so ~61k cells keep a chunk near ~2 GB
DEFAULT_BWD_CELLS = 61440


def _pad8(n):
    return -(-n // 8) * 8


def _gas_factors_e(od, e_raw):
    small = od <= 0.06
    od_safe = jnp.maximum(od, 0.06)
    e_safe = jnp.where(small, E006, e_raw)
    om = 1.0 - e_safe
    atrans = jnp.where(small, od - 0.5 * od * od, om)
    tf = jnp.where(small, REC_6 * od,
                   1.0 - 2.0 * (om - od_safe * e_safe)
                   / (od_safe * om))
    return atrans, tf


def rt_bwd_supported(*, native, cloudy, fused, n_cloud_fields, idrv,
                     planck_blocked, B, spec_dtype):
    """Whether the unrolled backward covers this configuration."""
    return (native == "blocked" and planck_blocked and not idrv
            and spec_dtype == jnp.float32
            and (not cloudy or (fused and n_cloud_fields == 4)))


def _build_g(L, G, G_pad, cloudy, with_taua, gate_thresh, ngb0_key,
             delwave_key):
    ngb0 = np.asarray(ngb0_key, np.int32)
    delwave = np.asarray(delwave_key, np.float64)
    L1 = L + 1
    L1p = _pad8(L1)

    ew_np = np.zeros((G_pad, NBANDS + 1), np.float32)
    ew_np[np.arange(G), ngb0] = 1.0
    ew_np[:G, NBANDS] = (WTDIFF * delwave[ngb0] * FLUXFAC
                         ).astype(np.float32)

    def g(taut_v, fracs_v, play_v, plev_v, surf_v, taua_v,
          cw_v, abi_v, abl_v, cldf_i):
        """(column-chunk values, column axis LAST) -> stacked flux
        rows (4, L1p, T): uflux/dflux/uclfl/dclfl."""
        ew = jnp.asarray(ew_np)
        ewb = ew[:, 0:NBANDS].astype(jnp.bfloat16)
        ew3 = jnp.concatenate([ewb, ewb, ewb], axis=1)
        wg = ew[:, NBANDS:NBANDS + 1]

        def edot_multi(ms):
            # binary one-hot x 3-level bf16 value split: f32-exact
            # band->g expansion in ONE MXU pass (see rtrn_pallas)
            m16 = (ms[0] if len(ms) == 1
                   else jnp.concatenate(ms, axis=1))
            m1 = m16.astype(jnp.bfloat16)
            r1 = m16 - m1.astype(jnp.float32)
            m2 = r1.astype(jnp.bfloat16)
            m3 = (r1 - m2.astype(jnp.float32)).astype(jnp.bfloat16)
            m = jnp.concatenate([m1, m2, m3], axis=0)
            M = jnp.dot(ew3, m, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            n = m16.shape[1] // len(ms)
            return [M[:, i * n:(i + 1) * n] for i in range(len(ms))]

        cldf_f = None
        if cloudy:
            cldf_f = (cldf_i.astype(jnp.float32)
                      if cldf_i.dtype != jnp.float32 else cldf_i)

        secd_g = edot_multi([surf_v[0:16, :]])[0]

        def lvl(l):
            """One level's optics (per-cell; no cross-level deps)."""
            rows = [play_v[l], plev_v[l]]
            if with_taua:
                rows.append(taua_v[l])
            if cloudy:
                rows.append(abi_v[l])
                rows.append(abl_v[l])
            exp_ = edot_multi(rows)
            blay, pg = exp_[0], exp_[1]
            nx = 2
            t = taut_v[l]
            if with_taua:
                t = t + exp_[nx]
                nx += 1
            od = jnp.maximum(secd_g * t, 0.0)
            e_od = jnp.exp(-od)
            atrans, tf = _gas_factors_e(od, e_od)
            fl_ = fracs_v[l]
            if not cloudy:
                return (atrans, tf, blay, pg, fl_,
                        None, None, None, None, None)
            cfl = cldf_f[l]
            gate = cfl >= gate_thresh
            cly = (jnp.max(gate.astype(jnp.float32), axis=0,
                           keepdims=True) > 0.0)
            ciwp = cw_v[l][0:1] * cfl
            clwp = cw_v[l][1:2] * cfl
            absc_i = jnp.where(ciwp == 0.0, 0.0, exp_[nx])
            absc_l = jnp.where(clwp == 0.0, 0.0, exp_[nx + 1])
            cwp = ciwp + clwp
            active = (cfl >= CLDMIN) & (cwp >= CLDMIN)
            od_raw = jnp.where(
                active, ciwp * absc_i + clwp * absc_l, 0.0)
            odcld = jnp.where(gate, secd_g * od_raw, 0.0)
            e_cld = jnp.exp(-odcld)
            efc = jnp.where(gate, (1.0 - e_cld) * cfl, 0.0)
            atot, tftot = _gas_factors_e(od + odcld, e_od * e_cld)
            return (atrans, tf, blay, pg, fl_,
                    cly, cfl, efc, atot, tftot)

        Tn = taut_v.shape[2]
        zero = jnp.zeros((G_pad, Tn), jnp.float32)
        one_row = jnp.zeros((1, Tn), jnp.float32)

        # ---- downward sweep (lev = L-1 .. 0) ----
        radld, radclrd, flag = zero, zero, one_row
        drad_rows = [None] * L
        cdrad_rows = [None] * L
        facs = [None] * L
        for l in reversed(range(L)):
            fa = lvl(l)
            facs[l] = fa
            (atrans, tf, blay, pg, fl_,
             cly, cfl, efc, atot, tftot) = fa
            dpl = pg - blay
            bbd = fl_ * (blay + tf * dpl)
            gassrc = atrans * bbd
            rad_gas = radld + (bbd - radld) * atrans
            if cloudy:
                bbdtot = fl_ * (blay + tftot * dpl)
                rad_cld = (radld
                           - radld * (atrans + efc * (1.0 - atrans))
                           + gassrc
                           + cfl * (bbdtot * atot - gassrc))
                radld = jnp.where(cly, rad_cld, rad_gas)
                flag = jnp.maximum(flag, cly.astype(jnp.float32))
                radclrd = jnp.where(flag > 0.0,
                                    radclrd
                                    + (bbd - radclrd) * atrans,
                                    radld)
            else:
                radld = rad_gas
                radclrd = radld
            drad_rows[l] = jnp.sum(wg * radld, axis=0)
            cdrad_rows[l] = jnp.sum(wg * radclrd, axis=0)

        # ---- surface ----
        sexp = edot_multi([surf_v[16:32, :], surf_v[32:48, :]])
        sem_g, pbnd_g = sexp[0], sexp[1]
        rad0 = fracs_v[0] * pbnd_g
        reflect = 1.0 - sem_g
        radlu = rad0 + reflect * radld
        radclru = rad0 + reflect * radclrd
        anyc = flag > 0.0
        urad_rows = [jnp.sum(wg * radlu, axis=0)]
        curad_rows = [jnp.sum(wg * radclru, axis=0)]

        # ---- upward sweep (lev = 0 .. L-1) ----
        for l in range(L):
            (atrans, tf, blay, pg, fl_,
             cly, cfl, efc, atot, tftot) = facs[l]
            pg_up = edot_multi([plev_v[l + 1]])[0]
            dpu = pg_up - blay
            bbu = fl_ * (blay + tf * dpu)
            gassrc = bbu * atrans
            rad_gas = radlu + (bbu - radlu) * atrans
            if cloudy:
                bbut = fl_ * (blay + tftot * dpu)
                rad_cld = (radlu
                           - radlu * (atrans + efc * (1.0 - atrans))
                           + gassrc
                           + cfl * (bbut * atot - gassrc))
                radlu = jnp.where(cly, rad_cld, rad_gas)
                radclru = jnp.where(anyc,
                                    radclru + (bbu - radclru)
                                    * atrans,
                                    radlu)
            else:
                radlu = rad_gas
                radclru = radlu
            urad_rows.append(jnp.sum(wg * radlu, axis=0))
            curad_rows.append(jnp.sum(wg * radclru, axis=0))

        def rows_to_out(rows):
            x = jnp.stack(rows, axis=0)
            if x.shape[0] < L1p:
                x = jnp.concatenate(
                    [x, jnp.zeros((L1p - x.shape[0], Tn),
                                  jnp.float32)], axis=0)
            return x

        return jnp.stack([rows_to_out(urad_rows),
                          rows_to_out(drad_rows),
                          rows_to_out(curad_rows),
                          rows_to_out(cdrad_rows)], axis=0)

    return g, L1p


def rt_bwd_fluxes(args, ct, *, static, gate_thresh, istart, iend,
                  interpret=False):
    """Backward of the blocked random-overlap `fluxes` custom_vjp.

    ``args`` is the 13-tuple at the custom_vjp boundary; ``ct`` the
    cotangents of (totuflux, totdflux, totuclfl, totdclfl).  Returns
    the full cotangent tuple (zeros/None where non-differentiable).
    """
    (taut, fracs, planklay, planklev, plankbnd, dplankbnd_dt,
     semiss, pwvcm, pz, cldf_g, odcld_g, taua, cloud_fields) = args
    from . import rtrn as rt_xla
    from ._vjp_chunk import chunked_vjp, pick_nchunk

    ngb_full = np.asarray(static["ngb"]) - 1
    gsel = np.nonzero((ngb_full >= istart - 1)
                      & (ngb_full <= iend - 1))[0]
    ngb0 = tuple(int(x) for x in ngb_full[gsel])
    delwave = tuple(float(x) for x in np.asarray(static["delwave"]))
    L, G_pad, B = taut.shape
    cloudy = cloud_fields is not None
    with_taua = taua is not None

    # surf rows exactly as the forward builds them (secdiff is
    # differentiable in pwvcm — vjp'd below)
    def build_surf(semiss, plankbnd, pwvcm):
        sec_band = rt_xla.secdiff(pwvcm, jnp.float32)
        return jnp.concatenate(
            [sec_band.T, semiss.T, plankbnd.T,
             jnp.zeros_like(plankbnd.T)], axis=0)

    surf, surf_vjp = jax.vjp(build_surf, semiss, plankbnd, pwvcm)

    g, L1p = _build_g(L, len(ngb0), G_pad, cloudy, with_taua,
                      float(gate_thresh), ngb0, delwave)

    if cloudy:
        cldf_t, cw_t, abi_t, abl_t = cloud_fields
    gargs = (taut.astype(jnp.float32), fracs.astype(jnp.float32),
             planklay, planklev, surf,
             jnp.moveaxis(taua, 0, 2) if with_taua else None,
             cw_t if cloudy else None,
             abi_t if cloudy else None,
             abl_t if cloudy else None,
             cldf_t if cloudy else None)
    gaxes = (2, 2, 2, 2, 1,
             2 if with_taua else None,
             2 if cloudy else None, 2 if cloudy else None,
             2 if cloudy else None, 2 if cloudy else None)

    ct4 = jnp.stack([jnp.moveaxis(c, 0, 1) for c in ct[:4]], axis=0)
    if ct4.shape[1] < L1p:
        ct4 = jnp.concatenate(
            [ct4, jnp.zeros((4, L1p - ct4.shape[1], B),
                            jnp.float32)], axis=1)

    target = int(os.environ.get("RRTMG_RT_BWD_CHUNK_CELLS",
                                DEFAULT_BWD_CELLS))
    nch = pick_nchunk(B, L, target)
    cts = chunked_vjp(g, gargs, ct4, gaxes, 2, nch)
    (ct_taut, ct_fracs, ct_play, ct_plev, ct_surf, ct_taua,
     ct_cw, ct_abi, ct_abl, _ct_cldf) = cts
    ct_semiss, ct_plankbnd, ct_pwvcm = surf_vjp(ct_surf)

    if cloudy:
        ct_cldf = (np.zeros(np.shape(cldf_t), jax.dtypes.float0)
                   if not jnp.issubdtype(cldf_t.dtype, jnp.inexact)
                   else _ct_cldf)
        ct_cloud = (ct_cldf, ct_cw, ct_abi, ct_abl)
    else:
        ct_cloud = None
    return (ct_taut.astype(taut.dtype), ct_fracs.astype(fracs.dtype),
            ct_play, ct_plev, ct_plankbnd,
            jnp.zeros_like(dplankbnd_dt), ct_semiss, ct_pwvcm,
            jnp.zeros_like(pz),
            None, None,
            jnp.moveaxis(ct_taua, 2, 0) if with_taua else None,
            ct_cloud)
