"""Scalar transcription of the reference non-McICA cldprop
(rrtmg_lw_cldprop.f90:50-295), including the running-scalar ``ncbands``
and the icb/iceind/liqind indirections, for validating the vectorized
``rrtmg_lw_tpu.ops.cldprop.cldprop_ncbands`` against an independent
reading of the Fortran.  Test-only code, like the rest of tests/oracle.
"""

import numpy as np

# icb(ib, ind): cloud-band -> coefficient-slot map (cldprop.f90:167-169)
ICB = np.array([[1] * 16,
                [1, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5],
                list(range(1, 17))]) - 1

# ipat(iband, idx): spectral band -> cloud band (rrtmg_lw_rtrn.f90:252)
IPAT = ICB

CLDMIN = 1.0e-20


def cldprop_1col(nlayers, inflag, iceflag, liqflag, cldfrac, tauc,
                 ciwp, clwp, rei, rel, tables):
    """One column.  tauc is (16, L) as read from IN_CLD_RRTM.
    Returns (ncbands, taucloud (L, 16) in CLOUD-band slots)."""
    absice0 = np.asarray(tables["absice0"], np.float64)
    absice1 = np.asarray(tables["absice1"], np.float64)
    absice2 = np.asarray(tables["absice2"], np.float64)
    absice3 = np.asarray(tables["absice3"], np.float64)
    absliq1 = np.asarray(tables["absliq1"], np.float64)
    absliq0 = float(tables["absliq0"])
    abscld1 = float(tables["abscld1"])

    ncbands = 1
    taucloud = np.zeros((nlayers, 16))
    tauctot = tauc.sum(axis=0)

    for lay in range(nlayers):
        cwp = ciwp[lay] + clwp[lay]
        if not (cldfrac[lay] >= CLDMIN
                and (cwp >= CLDMIN or tauctot[lay] >= CLDMIN)):
            continue
        if inflag == 0:
            ncbands = 16
            taucloud[lay, :16] = tauc[:, lay]
            continue
        if inflag == 1:
            ncbands = 16
            taucloud[lay, :16] = abscld1 * cwp
            continue
        # inflag == 2
        radice = rei[lay]
        abscoice = np.zeros(16)
        abscoliq = np.zeros(16)
        if ciwp[lay] == 0.0:
            abscoice[0] = 0.0
            iceind = 0
        elif iceflag == 0:
            assert radice >= 10.0, "ICE RADIUS TOO SMALL"
            abscoice[0] = absice0[0] + absice0[1] / radice
            iceind = 0
        elif iceflag == 1:
            assert 13.0 <= radice <= 130.0, "ICE RADIUS OUT OF BOUNDS"
            ncbands = 5
            for ib in range(5):
                abscoice[ib] = absice1[0, ib] + absice1[1, ib] / radice
            iceind = 1
        elif iceflag in (2, 3):
            tab = absice2 if iceflag == 2 else absice3
            nmax = 43 if iceflag == 2 else 46
            ncbands = 16
            factor = (radice - 2.0) / 3.0
            index = int(factor)
            if index == nmax:
                index = nmax - 1
            fint = factor - index
            for ib in range(16):
                abscoice[ib] = tab[index - 1, ib] + fint * (
                    tab[index, ib] - tab[index - 1, ib])
            iceind = 2
        if clwp[lay] == 0.0:
            abscoliq[0] = 0.0
            liqind = 0
            if iceind == 1:
                iceind = 2
        elif liqflag == 0:
            abscoliq[0] = absliq0
            liqind = 0
            if iceind == 1:
                iceind = 2
        elif liqflag == 1:
            radliq = rel[lay]
            assert 2.5 <= radliq <= 60.0, "LIQ RADIUS OUT OF BOUNDS"
            index = int(radliq - 1.5)
            if index == 0:
                index = 1
            if index == 58:
                index = 57
            fint = radliq - 1.5 - index
            ncbands = 16
            for ib in range(16):
                abscoliq[ib] = absliq1[index - 1, ib] + fint * (
                    absliq1[index, ib] - absliq1[index - 1, ib])
            liqind = 2
        for ib in range(ncbands):
            taucloud[lay, ib] = (ciwp[lay] * abscoice[ICB[iceind, ib]]
                                 + clwp[lay] * abscoliq[ICB[liqind, ib]])
    return ncbands, taucloud
