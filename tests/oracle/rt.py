"""Scalar RT oracle: literal transcription of rtrnmc/rtrn/rtrnmr.

Per-g-point serial loops over levels, exactly as the reference Fortran
(rrtmg_lw_rtrnmc.f90:283-593, rrtmg_lw_rtrn.f90, rrtmg_lw_rtrnmr.f90).

Non-McICA cloud input forms: ``cloud_bands=(taucloud_cb, ncbands)`` is
the Fortran contract (cloud-band slots, ipat spectral-band mapping,
secdiff of the CLOUD band — rtrn.f90:252,321,343-348).  The
``odcld_band`` form (per-g od weighted by the spectral band's secdiff)
matches the repo's pre-expanded convention and equals the Fortran only
when ncbands=16; use cloud_bands when the runtime-ncbands aliasing is
under test.
"""

from __future__ import annotations

import numpy as np

from .spec import A0, A1, A2, BPADE, NGS, REC_6, TBLINT, WTDIFF

FLUXFAC = 2.0e4 * np.pi


def secdiff_bands(pwvcm):
    sec = np.zeros(16)
    for ib in range(1, 17):
        if ib == 1 or ib == 4 or ib >= 10:
            sec[ib - 1] = 1.66
        else:
            s = A0[ib - 1] + A1[ib - 1] * np.exp(A2[ib - 1] * pwvcm)
            sec[ib - 1] = min(1.80, max(1.50, s))
    return sec


def _tbl_idx(x):
    return int(TBLINT * (x / (BPADE + x)) + 0.5)


def rtrnmc_1col(nlayers, pz, semiss, ngb, cldfmc, taucmc, planklay,
                planklev, plankbnd, pwvcm, fracs, taut, luts, heatfac,
                idrv=0, dplankbnd_dt=None, cldfrac_lay=None,
                odcld_band=None, mcica=True, cloud_bands=None):
    """rtrnmc (mcica=True) or rtrn (mcica=False, random overlap with
    per-layer cldfrac_lay + per-g odcld_band already mapped to g).

    ``cloud_bands=(taucloud_cb (L,16), ncbands)``: non-McICA cloud od
    straight from the Fortran cldprop contract — taucloud in CLOUD-band
    slots, mapped per spectral band through ipat and weighted by
    secdiff of the *cloud* band (rrtmg_lw_rtrn.f90:252,321,343-348).
    Mutually exclusive with odcld_band."""
    tau_tbl, exp_tbl, tfn_tbl = (luts["tau_tbl"], luts["exp_tbl"],
                                 luts["tfn_tbl"])
    sec = secdiff_bands(pwvcm)
    ngpt = taut.shape[1]
    if cloud_bands is not None:
        from .cld import IPAT
        taucloud_cb, ncbands = cloud_bands
        ipat = IPAT[{1: 0, 5: 1, 16: 2}[int(ncbands)]]

    icldlyr = np.zeros(nlayers, np.int64)
    odcld = np.zeros((nlayers, ngpt))
    abscld = np.zeros((nlayers, ngpt))
    efclfrac = np.zeros((nlayers, ngpt))
    cldf = np.zeros((nlayers, ngpt))
    for lay in range(nlayers):
        for ig in range(ngpt):
            ib = ngb[ig]
            if mcica:
                cloudy_g = cldfmc[ig, lay] == 1.0
                cf = cldfmc[ig, lay]
                oc = taucmc[ig, lay]
            else:
                cloudy_g = cldfrac_lay[lay] >= 1.0e-6
                cf = cldfrac_lay[lay]
                if cloud_bands is not None:
                    ib = ipat[ngb[ig]]
                    oc = taucloud_cb[lay, ib]
                else:
                    oc = odcld_band[lay, ig]
            if cloudy_g:
                odcld[lay, ig] = sec[ib] * oc
                abscld[lay, ig] = 1.0 - np.exp(-odcld[lay, ig])
                efclfrac[lay, ig] = abscld[lay, ig] * cf
                icldlyr[lay] = 1
            cldf[lay, ig] = cf

    totuflux = np.zeros(nlayers + 1)
    totdflux = np.zeros(nlayers + 1)
    totuclfl = np.zeros(nlayers + 1)
    totdclfl = np.zeros(nlayers + 1)
    dtotuflux_dt = np.zeros(nlayers + 1)
    dtotuclfl_dt = np.zeros(nlayers + 1)
    urad = np.zeros(nlayers + 1)
    drad = np.zeros(nlayers + 1)
    clrurad = np.zeros(nlayers + 1)
    clrdrad = np.zeros(nlayers + 1)
    d_urad_dt = np.zeros(nlayers + 1)
    d_clrurad_dt = np.zeros(nlayers + 1)

    atrans = np.zeros(nlayers)
    atot = np.zeros(nlayers)
    bbugas = np.zeros(nlayers)
    bbutot = np.zeros(nlayers)

    for iband in range(1, 17):
        for igc in range(NGS[iband - 1], NGS[iband]):
            radld = 0.0
            radclrd = 0.0
            iclddn = 0
            for lev in range(nlayers - 1, -1, -1):
                plfrac = fracs[lev, igc]
                blay = planklay[lev, iband - 1]
                dplankup = planklev[lev + 1, iband - 1] - blay
                dplankdn = planklev[lev, iband - 1] - blay
                odepth = max(0.0, sec[iband - 1] * taut[lev, igc])
                if icldlyr[lev] == 1:
                    iclddn = 1
                    odtot = odepth + odcld[lev, igc]
                    if odtot < 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_rec = REC_6 * odepth
                        gassrc = plfrac * (blay + dplankdn * odepth_rec) \
                            * atrans[lev]
                        atot[lev] = odtot - 0.5 * odtot * odtot
                        odtot_rec = REC_6 * odtot
                        bbdtot = plfrac * (blay + dplankdn * odtot_rec)
                        bbd = plfrac * (blay + dplankdn * odepth_rec)
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_rec)
                        bbutot[lev] = plfrac * (blay + dplankup * odtot_rec)
                    elif odepth <= 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_rec = REC_6 * odepth
                        gassrc = plfrac * (blay + dplankdn * odepth_rec) \
                            * atrans[lev]
                        odtot = odepth + odcld[lev, igc]
                        ittot = _tbl_idx(odtot)
                        tfactot = tfn_tbl[ittot]
                        bbdtot = plfrac * (blay + tfactot * dplankdn)
                        bbd = plfrac * (blay + dplankdn * odepth_rec)
                        atot[lev] = 1.0 - exp_tbl[ittot]
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_rec)
                        bbutot[lev] = plfrac * (blay + tfactot * dplankup)
                    else:
                        itgas = _tbl_idx(odepth)
                        odepth = tau_tbl[itgas]
                        atrans[lev] = 1.0 - exp_tbl[itgas]
                        tfacgas = tfn_tbl[itgas]
                        gassrc = atrans[lev] * plfrac * (
                            blay + tfacgas * dplankdn)
                        odtot = odepth + odcld[lev, igc]
                        ittot = _tbl_idx(odtot)
                        tfactot = tfn_tbl[ittot]
                        bbdtot = plfrac * (blay + tfactot * dplankdn)
                        bbd = plfrac * (blay + tfacgas * dplankdn)
                        atot[lev] = 1.0 - exp_tbl[ittot]
                        bbugas[lev] = plfrac * (blay + tfacgas * dplankup)
                        bbutot[lev] = plfrac * (blay + tfactot * dplankup)
                    radld = (radld - radld * (atrans[lev]
                             + efclfrac[lev, igc] * (1.0 - atrans[lev]))
                             + gassrc + cldf[lev, igc]
                             * (bbdtot * atot[lev] - gassrc))
                    drad[lev] += radld
                else:
                    if odepth <= 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_r = REC_6 * odepth
                        bbd = plfrac * (blay + dplankdn * odepth_r)
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_r)
                    else:
                        itr = _tbl_idx(odepth)
                        transc = exp_tbl[itr]
                        atrans[lev] = 1.0 - transc
                        tausfac = tfn_tbl[itr]
                        bbd = plfrac * (blay + tausfac * dplankdn)
                        bbugas[lev] = plfrac * (blay + tausfac * dplankup)
                    radld = radld + (bbd - radld) * atrans[lev]
                    drad[lev] += radld
                if iclddn == 1:
                    radclrd = radclrd + (bbd - radclrd) * atrans[lev]
                    clrdrad[lev] += radclrd
                else:
                    radclrd = radld
                    clrdrad[lev] = drad[lev]

            rad0 = fracs[0, igc] * plankbnd[iband - 1]
            if idrv:
                d_rad0_dt = fracs[0, igc] * dplankbnd_dt[iband - 1]
            reflect = 1.0 - semiss[iband - 1]
            radlu = rad0 + reflect * radld
            radclru = rad0 + reflect * radclrd
            urad[0] += radlu
            clrurad[0] += radclru
            if idrv:
                d_radlu_dt = d_rad0_dt
                d_urad_dt[0] += d_radlu_dt
                d_radclru_dt = d_rad0_dt
                d_clrurad_dt[0] += d_radclru_dt

            for lev in range(nlayers):
                if icldlyr[lev] == 1:
                    gassrc = bbugas[lev] * atrans[lev]
                    radlu = (radlu - radlu * (atrans[lev]
                             + efclfrac[lev, igc] * (1.0 - atrans[lev]))
                             + gassrc + cldf[lev, igc]
                             * (bbutot[lev] * atot[lev] - gassrc))
                    urad[lev + 1] += radlu
                    if idrv:
                        d_radlu_dt = (d_radlu_dt * cldf[lev, igc]
                                      * (1.0 - atot[lev])
                                      + d_radlu_dt * (1.0 - cldf[lev, igc])
                                      * (1.0 - atrans[lev]))
                        d_urad_dt[lev + 1] += d_radlu_dt
                else:
                    radlu = radlu + (bbugas[lev] - radlu) * atrans[lev]
                    urad[lev + 1] += radlu
                    if idrv:
                        d_radlu_dt = d_radlu_dt * (1.0 - atrans[lev])
                        d_urad_dt[lev + 1] += d_radlu_dt
                if iclddn == 1:
                    radclru = radclru + (bbugas[lev] - radclru) * atrans[lev]
                    clrurad[lev + 1] += radclru
                else:
                    radclru = radlu
                    clrurad[lev + 1] = urad[lev + 1]
                if idrv:
                    if iclddn == 1:
                        d_radclru_dt = d_radclru_dt * (1.0 - atrans[lev])
                        d_clrurad_dt[lev + 1] += d_radclru_dt
                    else:
                        d_radclru_dt = d_radlu_dt
                        d_clrurad_dt[lev + 1] = d_urad_dt[lev + 1]

        delwave = luts["delwave"][iband - 1]
        for lev in range(nlayers + 1):
            totuflux[lev] += urad[lev] * WTDIFF * delwave
            totdflux[lev] += drad[lev] * WTDIFF * delwave
            urad[lev] = 0.0
            drad[lev] = 0.0
            totuclfl[lev] += clrurad[lev] * WTDIFF * delwave
            totdclfl[lev] += clrdrad[lev] * WTDIFF * delwave
            clrurad[lev] = 0.0
            clrdrad[lev] = 0.0
        if idrv:
            for lev in range(nlayers + 1):
                dtotuflux_dt[lev] += d_urad_dt[lev] * WTDIFF * delwave \
                    * FLUXFAC
                d_urad_dt[lev] = 0.0
                dtotuclfl_dt[lev] += d_clrurad_dt[lev] * WTDIFF * delwave \
                    * FLUXFAC
                d_clrurad_dt[lev] = 0.0

    totuflux *= FLUXFAC
    totdflux *= FLUXFAC
    totuclfl *= FLUXFAC
    totdclfl *= FLUXFAC
    fnet = totuflux - totdflux
    fnetc = totuclfl - totdclfl
    htr = np.zeros(nlayers + 1)
    htrc = np.zeros(nlayers + 1)
    for lev in range(1, nlayers + 1):
        htr[lev - 1] = heatfac * (fnet[lev - 1] - fnet[lev]) / (
            pz[lev - 1] - pz[lev])
        htrc[lev - 1] = heatfac * (fnetc[lev - 1] - fnetc[lev]) / (
            pz[lev - 1] - pz[lev])
    out = dict(totuflux=totuflux, totdflux=totdflux, htr=htr[:nlayers],
               totuclfl=totuclfl, totdclfl=totdclfl, htrc=htrc[:nlayers])
    if idrv:
        out["dtotuflux_dt"] = dtotuflux_dt
        out["dtotuclfl_dt"] = dtotuclfl_dt
    return out


def rtrnmr_1col(nlayers, pz, semiss, ngb, cldfrac, odcld_band, planklay,
                planklev, plankbnd, pwvcm, fracs, taut, luts, heatfac,
                idrv=0, dplankbnd_dt=None, cloud_bands=None):
    """rtrnmr.f90: maximum-random overlap; odcld_band (L, G) per g
    (already mapped from cloud bands), or
    ``cloud_bands=(taucloud_cb (L,16), ncbands)`` for the Fortran
    ipat/secdiff(cloud band) contract (rrtmg_lw_rtrnmr.f90:334-343,
    514-520)."""
    tau_tbl, exp_tbl, tfn_tbl = (luts["tau_tbl"], luts["exp_tbl"],
                                 luts["tfn_tbl"])
    sec = secdiff_bands(pwvcm)
    ngpt = taut.shape[1]
    if cloud_bands is not None:
        from .cld import IPAT
        taucloud_cb, ncbands = cloud_bands
        ipat = IPAT[{1: 0, 5: 1, 16: 2}[int(ncbands)]]

    icldlyr = np.zeros(nlayers + 2, np.int64)
    odcld = np.zeros((nlayers + 1, ngpt))
    for lay in range(1, nlayers + 1):
        if cldfrac[lay - 1] >= 1.0e-6:
            icldlyr[lay] = 1
            for ig in range(ngpt):
                if cloud_bands is not None:
                    ib = ipat[ngb[ig]]
                    odcld[lay, ig] = sec[ib] * taucloud_cb[lay - 1, ib]
                else:
                    odcld[lay, ig] = sec[ngb[ig]] \
                        * odcld_band[lay - 1, ig]

    cldf = np.zeros(nlayers + 2)
    cldf[1:nlayers + 1] = cldfrac

    # ---- overlap factor pre-passes (1-based arrays, zero-initialized) ----
    faccld1 = np.zeros(nlayers + 2)
    faccld2 = np.zeros(nlayers + 2)
    facclr1 = np.zeros(nlayers + 2)
    facclr2 = np.zeros(nlayers + 2)
    faccmb1 = np.zeros(nlayers + 2)
    faccmb2 = np.zeros(nlayers + 2)
    istcld = np.zeros(nlayers + 2, np.int64)
    istcld[1] = 1
    rat1 = rat2 = 0.0
    for lev in range(1, nlayers + 1):
        if icldlyr[lev] == 1:
            istcld[lev + 1] = 0
            if lev == nlayers:
                faccld1[lev + 1] = 0.0
                faccld2[lev + 1] = 0.0
                facclr1[lev + 1] = 0.0
                facclr2[lev + 1] = 0.0
                faccmb1[lev + 1] = 0.0
                faccmb2[lev + 1] = 0.0
            elif cldf[lev + 1] >= cldf[lev]:
                faccld1[lev + 1] = 0.0
                faccld2[lev + 1] = 0.0
                if istcld[lev] == 1:
                    facclr1[lev + 1] = 0.0
                    facclr2[lev + 1] = 0.0
                    if cldf[lev] < 1.0:
                        facclr2[lev + 1] = (cldf[lev + 1] - cldf[lev]) / (
                            1.0 - cldf[lev])
                    facclr2[lev] = 0.0
                    faccld2[lev] = 0.0
                else:
                    fmax = max(cldf[lev], cldf[lev - 1])
                    if cldf[lev + 1] > fmax:
                        facclr1[lev + 1] = rat2
                        facclr2[lev + 1] = (cldf[lev + 1] - fmax) / (
                            1.0 - fmax)
                    elif cldf[lev + 1] < fmax:
                        facclr1[lev + 1] = (cldf[lev + 1] - cldf[lev]) / (
                            cldf[lev - 1] - cldf[lev])
                        facclr2[lev + 1] = 0.0
                    else:
                        facclr1[lev + 1] = rat2
                        facclr2[lev + 1] = 0.0
                if facclr1[lev + 1] > 0.0 or facclr2[lev + 1] > 0.0:
                    rat1, rat2 = 1.0, 0.0
                else:
                    rat1, rat2 = 0.0, 0.0
            else:
                facclr1[lev + 1] = 0.0
                facclr2[lev + 1] = 0.0
                if istcld[lev] == 1:
                    faccld1[lev + 1] = 0.0
                    faccld2[lev + 1] = (cldf[lev] - cldf[lev + 1]) / cldf[lev]
                    facclr2[lev] = 0.0
                    faccld2[lev] = 0.0
                else:
                    fmin = min(cldf[lev], cldf[lev - 1])
                    if cldf[lev + 1] <= fmin:
                        faccld1[lev + 1] = rat1
                        faccld2[lev + 1] = (fmin - cldf[lev + 1]) / fmin
                    else:
                        faccld1[lev + 1] = (cldf[lev] - cldf[lev + 1]) / (
                            cldf[lev] - fmin)
                        faccld2[lev + 1] = 0.0
                if faccld1[lev + 1] > 0.0 or faccld2[lev + 1] > 0.0:
                    rat1, rat2 = 0.0, 1.0
                else:
                    rat1, rat2 = 0.0, 0.0
            if istcld[lev] != 1:
                faccmb1[lev + 1] = max(0.0, min(cldf[lev + 1] - cldf[lev],
                                                cldf[lev - 1] - cldf[lev]))
                faccmb2[lev + 1] = max(0.0, min(cldf[lev] - cldf[lev + 1],
                                                cldf[lev] - cldf[lev - 1]))
        else:
            istcld[lev + 1] = 1

    faccld1d = np.zeros(nlayers + 1)
    faccld2d = np.zeros(nlayers + 1)
    facclr1d = np.zeros(nlayers + 1)
    facclr2d = np.zeros(nlayers + 1)
    faccmb1d = np.zeros(nlayers + 1)
    faccmb2d = np.zeros(nlayers + 1)
    istcldd = np.zeros(nlayers + 1, np.int64)
    istcldd[nlayers] = 1
    rat1 = rat2 = 0.0
    for lev in range(nlayers, 0, -1):
        if icldlyr[lev] == 1:
            istcldd[lev - 1] = 0
            if lev == 1:
                faccld1d[lev - 1] = 0.0
                faccld2d[lev - 1] = 0.0
                facclr1d[lev - 1] = 0.0
                facclr2d[lev - 1] = 0.0
                faccmb1d[lev - 1] = 0.0
                faccmb2d[lev - 1] = 0.0
            elif cldf[lev - 1] >= cldf[lev]:
                faccld1d[lev - 1] = 0.0
                faccld2d[lev - 1] = 0.0
                if istcldd[lev] == 1:
                    facclr1d[lev - 1] = 0.0
                    facclr2d[lev - 1] = 0.0
                    if cldf[lev] < 1.0:
                        facclr2d[lev - 1] = (cldf[lev - 1] - cldf[lev]) / (
                            1.0 - cldf[lev])
                    facclr2d[lev] = 0.0
                    faccld2d[lev] = 0.0
                else:
                    fmax = max(cldf[lev], cldf[lev + 1])
                    if cldf[lev - 1] > fmax:
                        facclr1d[lev - 1] = rat2
                        facclr2d[lev - 1] = (cldf[lev - 1] - fmax) / (
                            1.0 - fmax)
                    elif cldf[lev - 1] < fmax:
                        facclr1d[lev - 1] = (cldf[lev - 1] - cldf[lev]) / (
                            cldf[lev + 1] - cldf[lev])
                        facclr2d[lev - 1] = 0.0
                    else:
                        facclr1d[lev - 1] = rat2
                        facclr2d[lev - 1] = 0.0
                if facclr1d[lev - 1] > 0.0 or facclr2d[lev - 1] > 0.0:
                    rat1, rat2 = 1.0, 0.0
                else:
                    rat1, rat2 = 0.0, 0.0
            else:
                facclr1d[lev - 1] = 0.0
                facclr2d[lev - 1] = 0.0
                if istcldd[lev] == 1:
                    faccld1d[lev - 1] = 0.0
                    faccld2d[lev - 1] = (cldf[lev] - cldf[lev - 1]) / cldf[lev]
                    facclr2d[lev] = 0.0
                    faccld2d[lev] = 0.0
                else:
                    fmin = min(cldf[lev], cldf[lev + 1])
                    if cldf[lev - 1] <= fmin:
                        faccld1d[lev - 1] = rat1
                        faccld2d[lev - 1] = (fmin - cldf[lev - 1]) / fmin
                    else:
                        faccld1d[lev - 1] = (cldf[lev] - cldf[lev - 1]) / (
                            cldf[lev] - fmin)
                        faccld2d[lev - 1] = 0.0
                if faccld1d[lev - 1] > 0.0 or faccld2d[lev - 1] > 0.0:
                    rat1, rat2 = 0.0, 1.0
                else:
                    rat1, rat2 = 0.0, 0.0
            if istcldd[lev] != 1:
                faccmb1d[lev - 1] = max(0.0, min(cldf[lev + 1] - cldf[lev],
                                                 cldf[lev - 1] - cldf[lev]))
                faccmb2d[lev - 1] = max(0.0, min(cldf[lev] - cldf[lev + 1],
                                                 cldf[lev] - cldf[lev - 1]))
        else:
            istcldd[lev - 1] = 1

    totuflux = np.zeros(nlayers + 1)
    totdflux = np.zeros(nlayers + 1)
    totuclfl = np.zeros(nlayers + 1)
    totdclfl = np.zeros(nlayers + 1)
    dtotuflux_dt = np.zeros(nlayers + 1)
    dtotuclfl_dt = np.zeros(nlayers + 1)
    urad = np.zeros(nlayers + 1)
    drad = np.zeros(nlayers + 1)
    clrurad = np.zeros(nlayers + 1)
    clrdrad = np.zeros(nlayers + 1)
    d_urad_dt = np.zeros(nlayers + 1)
    d_clrurad_dt = np.zeros(nlayers + 1)

    atrans = np.zeros(nlayers + 1)
    atot = np.zeros(nlayers + 1)
    bbugas = np.zeros(nlayers + 1)
    bbutot = np.zeros(nlayers + 1)

    for iband in range(1, 17):
        for igc in range(NGS[iband - 1], NGS[iband]):
            radld = 0.0
            radclrd = 0.0
            iclddn = 0
            cldradd = clrradd = rad = 0.0
            for lev in range(nlayers, 0, -1):
                plfrac = fracs[lev - 1, igc]
                blay = planklay[lev - 1, iband - 1]
                dplankup = planklev[lev, iband - 1] - blay
                dplankdn = planklev[lev - 1, iband - 1] - blay
                odepth = max(0.0, sec[iband - 1] * taut[lev - 1, igc])
                if icldlyr[lev] == 1:
                    iclddn = 1
                    odtot = odepth + odcld[lev, igc]
                    if odtot < 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_rec = REC_6 * odepth
                        gassrc = plfrac * (blay + dplankdn * odepth_rec) \
                            * atrans[lev]
                        atot[lev] = odtot - 0.5 * odtot * odtot
                        odtot_rec = REC_6 * odtot
                        bbdtot = plfrac * (blay + dplankdn * odtot_rec)
                        bbd = plfrac * (blay + dplankdn * odepth_rec)
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_rec)
                        bbutot[lev] = plfrac * (blay + dplankup * odtot_rec)
                    elif odepth <= 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_rec = REC_6 * odepth
                        gassrc = plfrac * (blay + dplankdn * odepth_rec) \
                            * atrans[lev]
                        odtot = odepth + odcld[lev, igc]
                        ittot = _tbl_idx(odtot)
                        tfactot = tfn_tbl[ittot]
                        bbdtot = plfrac * (blay + tfactot * dplankdn)
                        bbd = plfrac * (blay + dplankdn * odepth_rec)
                        atot[lev] = 1.0 - exp_tbl[ittot]
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_rec)
                        bbutot[lev] = plfrac * (blay + tfactot * dplankup)
                    else:
                        itgas = _tbl_idx(odepth)
                        odepth = tau_tbl[itgas]
                        atrans[lev] = 1.0 - exp_tbl[itgas]
                        tfacgas = tfn_tbl[itgas]
                        gassrc = atrans[lev] * plfrac * (
                            blay + tfacgas * dplankdn)
                        odtot = odepth + odcld[lev, igc]
                        ittot = _tbl_idx(odtot)
                        tfactot = tfn_tbl[ittot]
                        bbdtot = plfrac * (blay + tfactot * dplankdn)
                        bbd = plfrac * (blay + tfacgas * dplankdn)
                        atot[lev] = 1.0 - exp_tbl[ittot]
                        bbugas[lev] = plfrac * (blay + tfacgas * dplankup)
                        bbutot[lev] = plfrac * (blay + tfactot * dplankup)

                    if istcldd[lev] == 1:
                        cldradd = cldf[lev] * radld
                        clrradd = radld - cldradd
                        rad = 0.0
                    ttot = 1.0 - atot[lev]
                    cldsrc = bbdtot * atot[lev]
                    cldradd = cldradd * ttot + cldf[lev] * cldsrc
                    clrradd = clrradd * (1.0 - atrans[lev]) + (
                        1.0 - cldf[lev]) * gassrc
                    radld = cldradd + clrradd
                    drad[lev - 1] += radld
                    radmod = rad * (facclr1d[lev - 1] * (1.0 - atrans[lev])
                                    + faccld1d[lev - 1] * ttot) \
                        - faccmb1d[lev - 1] * gassrc \
                        + faccmb2d[lev - 1] * cldsrc
                    oldcld = cldradd - radmod
                    oldclr = clrradd + radmod
                    rad = -radmod + facclr2d[lev - 1] * oldclr \
                        - faccld2d[lev - 1] * oldcld
                    cldradd += rad
                    clrradd -= rad
                else:
                    if odepth <= 0.06:
                        atrans[lev] = odepth - 0.5 * odepth * odepth
                        odepth_r = REC_6 * odepth
                        bbd = plfrac * (blay + dplankdn * odepth_r)
                        bbugas[lev] = plfrac * (blay + dplankup * odepth_r)
                    else:
                        itr = _tbl_idx(odepth)
                        transc = exp_tbl[itr]
                        atrans[lev] = 1.0 - transc
                        tausfac = tfn_tbl[itr]
                        bbd = plfrac * (blay + tausfac * dplankdn)
                        bbugas[lev] = plfrac * (blay + tausfac * dplankup)
                    radld = radld + (bbd - radld) * atrans[lev]
                    drad[lev - 1] += radld
                if iclddn == 1:
                    radclrd = radclrd + (bbd - radclrd) * atrans[lev]
                    clrdrad[lev - 1] += radclrd
                else:
                    radclrd = radld
                    clrdrad[lev - 1] = drad[lev - 1]

            rad0 = fracs[0, igc] * plankbnd[iband - 1]
            if idrv:
                d_rad0_dt = fracs[0, igc] * dplankbnd_dt[iband - 1]
            reflect = 1.0 - semiss[iband - 1]
            radlu = rad0 + reflect * radld
            radclru = rad0 + reflect * radclrd
            urad[0] += radlu
            clrurad[0] += radclru
            if idrv:
                d_radlu_dt = d_rad0_dt
                d_urad_dt[0] += d_radlu_dt
                d_radclru_dt = d_rad0_dt
                d_clrurad_dt[0] += d_radclru_dt

            cldradu = clrradu = rad = 0.0
            for lev in range(1, nlayers + 1):
                if icldlyr[lev] == 1:
                    gassrc = bbugas[lev] * atrans[lev]
                    if istcld[lev] == 1:
                        cldradu = cldf[lev] * radlu
                        clrradu = radlu - cldradu
                        rad = 0.0
                    ttot = 1.0 - atot[lev]
                    cldsrc = bbutot[lev] * atot[lev]
                    cldradu = cldradu * ttot + cldf[lev] * cldsrc
                    clrradu = clrradu * (1.0 - atrans[lev]) + (
                        1.0 - cldf[lev]) * gassrc
                    radlu = cldradu + clrradu
                    urad[lev] += radlu
                    radmod = rad * (facclr1[lev + 1] * (1.0 - atrans[lev])
                                    + faccld1[lev + 1] * ttot) \
                        - faccmb1[lev + 1] * gassrc + faccmb2[lev + 1] * cldsrc
                    oldcld = cldradu - radmod
                    oldclr = clrradu + radmod
                    rad = -radmod + facclr2[lev + 1] * oldclr \
                        - faccld2[lev + 1] * oldcld
                    cldradu += rad
                    clrradu -= rad
                    if idrv:
                        d_radlu_dt = (d_radlu_dt * cldf[lev]
                                      * (1.0 - atot[lev])
                                      + d_radlu_dt * (1.0 - cldf[lev])
                                      * (1.0 - atrans[lev]))
                        d_urad_dt[lev] += d_radlu_dt
                else:
                    radlu = radlu + (bbugas[lev] - radlu) * atrans[lev]
                    urad[lev] += radlu
                    if idrv:
                        d_radlu_dt = d_radlu_dt * (1.0 - atrans[lev])
                        d_urad_dt[lev] += d_radlu_dt
                if iclddn == 1:
                    radclru = radclru + (bbugas[lev] - radclru) * atrans[lev]
                    clrurad[lev] += radclru
                else:
                    radclru = radlu
                    clrurad[lev] = urad[lev]
                if idrv:
                    if iclddn == 1:
                        d_radclru_dt = d_radclru_dt * (1.0 - atrans[lev])
                        d_clrurad_dt[lev] += d_radclru_dt
                    else:
                        d_radclru_dt = d_radlu_dt
                        d_clrurad_dt[lev] = d_urad_dt[lev]

        delwave = luts["delwave"][iband - 1]
        for lev in range(nlayers + 1):
            totuflux[lev] += urad[lev] * WTDIFF * delwave
            totdflux[lev] += drad[lev] * WTDIFF * delwave
            urad[lev] = 0.0
            drad[lev] = 0.0
            totuclfl[lev] += clrurad[lev] * WTDIFF * delwave
            totdclfl[lev] += clrdrad[lev] * WTDIFF * delwave
            clrurad[lev] = 0.0
            clrdrad[lev] = 0.0
        if idrv:
            for lev in range(nlayers + 1):
                dtotuflux_dt[lev] += d_urad_dt[lev] * WTDIFF * delwave \
                    * FLUXFAC
                d_urad_dt[lev] = 0.0
                dtotuclfl_dt[lev] += d_clrurad_dt[lev] * WTDIFF * delwave \
                    * FLUXFAC
                d_clrurad_dt[lev] = 0.0

    totuflux *= FLUXFAC
    totdflux *= FLUXFAC
    totuclfl *= FLUXFAC
    totdclfl *= FLUXFAC
    fnet = totuflux - totdflux
    fnetc = totuclfl - totdclfl
    htr = np.zeros(nlayers + 1)
    htrc = np.zeros(nlayers + 1)
    for lev in range(1, nlayers + 1):
        htr[lev - 1] = heatfac * (fnet[lev - 1] - fnet[lev]) / (
            pz[lev - 1] - pz[lev])
        htrc[lev - 1] = heatfac * (fnetc[lev - 1] - fnetc[lev]) / (
            pz[lev - 1] - pz[lev])
    out = dict(totuflux=totuflux, totdflux=totdflux, htr=htr[:nlayers],
               totuclfl=totuclfl, totdclfl=totdclfl, htrc=htrc[:nlayers])
    if idrv:
        out["dtotuflux_dt"] = dtotuflux_dt
        out["dtotuclfl_dt"] = dtotuclfl_dt
    return out
