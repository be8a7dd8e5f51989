"""One-shot on-hardware Pallas verification artifact (VERDICT r1 #5).

The pytest kernel-parity suites run in interpret mode on CPU, which
does not exercise Mosaic lowering or real bf16-split MXU behavior.
This tool runs the Pallas-vs-XLA comparisons COMPILED on the real
chip, f32, and writes a JSON pass/fail + max-error table to
``TPU_VERIFY_r{N}.json`` at the repo root.  Run it whenever the axon
tunnel is up; commit the artifact.

Checks (tolerances follow the documented 2^-17 bf16-2-split bound,
PERF_NOTES fact 2/7; flux gates mirror tests/test_rtrn_pallas.py):

  kernel-level: taumol Pallas vs XLA engine; blocked planck interp vs
  setcoef; model-level: clear / McICA (plain + compact + int8 mask) /
  banded icld=1 / max-random icld=2 / idrv=1 / deep nlay=140 chunked —
  each full-Pallas pipeline vs the full-XLA pipeline on identical
  inputs, on-chip.

Usage: python tools/tpu_verify.py [--round N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

RESULTS = []


def record(name, max_err, tol, extra=None):
    ok = bool(max_err <= tol)
    RESULTS.append(dict(check=name, max_err=float(max_err),
                        tol=float(tol), ok=ok, **(extra or {})))
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} "
          f"max_err={max_err:.3e}  tol={tol:.1e}")
    return ok


def _flux_err(a, b):
    """Max abs error over flux fields, scaled by the field magnitude."""
    err = 0.0
    for name in ("uflx", "dflx", "uflxc", "dflxc"):
        x = np.asarray(getattr(a, name), np.float64)
        y = np.asarray(getattr(b, name), np.float64)
        scale = max(np.abs(x).max(), 1.0)
        err = max(err, np.abs(x - y).max() / scale)
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU smoke test: force interpret=True on every "
                         "pallas_call (validates the harness, NOT the "
                         "Mosaic lowering)")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        from jax.experimental import pallas as _pl
        _orig_call = _pl.pallas_call

        def _interp_call(*a, **k):
            k["interpret"] = True
            return _orig_call(*a, **k)

        _pl.pallas_call = _interp_call

    import jax.numpy as jnp

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    print(f"backend={backend} device={dev}")
    if backend not in ("tpu", "axon"):
        print("WARNING: not on TPU — artifact will be marked cpu-only")

    from rrtmg_lw_tpu import LWConfig, make_model
    from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                              make_mcica_clouds,
                                              make_band_clouds)

    B = args.batch
    SPLIT_TOL = 2.0 ** -17            # documented split precision
    FLUX_TOL = 2e-5                   # relative; ~10x the split bound
    t0 = time.time()

    def models(**kw):
        xla = make_model(LWConfig(dtype="float32", use_lut=False,
                                  taumol_impl="xla", rt_impl="xla", **kw))
        pls = make_model(LWConfig(dtype="float32", use_lut=False,
                                  taumol_impl="pallas", rt_impl="pallas",
                                  **kw))
        return xla, pls

    # ---- kernel-level: taumol --------------------------------------
    from rrtmg_lw_tpu.ops.inatm import inatm
    from rrtmg_lw_tpu.ops.setcoef import setcoef
    atm = make_atmosphere(ncol=B, nlay=60, dtype=jnp.float32)
    xla0, pls0 = models(icld=0)
    prof = inatm(atm, dtype=jnp.float32)
    sc = setcoef(prof, xla0.static, istart=1, idrv=0)
    tg_x, fr_x = jax.jit(lambda s, p: xla0.engine(s, p))(sc, prof)
    tg_p, fr_p = jax.jit(lambda s, p: pls0.engine(s, p))(sc, prof)
    # denominator floored at od=0.01: below that, absolute od error is
    # what bounds the transmission error (1 - exp(-od) ~ od); relative
    # error on od ~ 1e-10 is meaningless for fluxes
    den = np.maximum(np.abs(np.asarray(tg_x, np.float64)), 1e-2)
    e_t = (np.abs(np.asarray(tg_p, np.float64)
                  - np.asarray(tg_x, np.float64)) / den).max()
    record("taumol_kernel_taug_rel", e_t, 4 * SPLIT_TOL)
    e_f = np.abs(np.asarray(fr_p, np.float64)
                 - np.asarray(fr_x, np.float64)).max()
    record("taumol_kernel_fracs_abs", e_f, 4 * SPLIT_TOL)

    # ---- kernel-level: blocked planck interp -----------------------
    from rrtmg_lw_tpu.ops.planck_pallas import planck_interp_blocked
    pl = jax.jit(lambda t: planck_interp_blocked(
        t, xla0.static["totplnk"], tile=128))(prof.tavel.T)
    # reference: setcoef's planklay is (B, L, 16); blocked is (L, 16, B)
    ref = np.asarray(sc.planklay, np.float64).transpose(1, 2, 0)
    got = np.asarray(pl, np.float64)
    scale = max(np.abs(ref).max(), 1e-12)
    record("planck_blocked_rel", np.abs(got - ref).max() / scale,
           4 * SPLIT_TOL)

    # ---- model-level configurations --------------------------------
    def check_model(name, kw, clouds):
        xla, pls = models(**kw)
        fx = jax.jit(lambda a, c: xla(a, c))(atm_l, clouds)
        fp = jax.jit(lambda a, c: pls(a, c))(atm_l, clouds)
        jax.block_until_ready((fx.uflx, fp.uflx))
        record(name, _flux_err(fx, fp), FLUX_TOL)

    atm_l = atm
    check_model("model_clear", dict(icld=0), None)
    mc = make_mcica_clouds(ncol=B, nlay=60, dtype=jnp.float32)
    check_model("model_mcica_plain",
                dict(icld=2, imca=1, inflag=2, iceflag=3, liqflag=1), mc)
    mcc = make_mcica_clouds(ncol=B, nlay=60, dtype=jnp.float32,
                            layout="compact")
    check_model("model_mcica_compact",
                dict(icld=2, imca=1, inflag=2, iceflag=3, liqflag=1), mcc)
    check_model("model_mcica_idrv",
                dict(icld=2, imca=1, idrv=1, inflag=2, iceflag=3,
                     liqflag=1), mc)
    bc = make_band_clouds(ncol=B, nlay=60, dtype=jnp.float32)
    check_model("model_banded_icld1",
                dict(icld=1, imca=0, inflag=2, iceflag=3, liqflag=1), bc)
    check_model("model_maxrand_icld2",
                dict(icld=2, imca=0, inflag=2, iceflag=3, liqflag=1), bc)

    # ---- physics invariant ON SILICON (round 4): the COMPILED Pallas
    # pipeline must satisfy the isothermal-enclosure fixed point
    # against the first-principles blackbody quadrature — an anchor
    # independent of the XLA engines, the oracle AND the k-tables
    # (tests/test_invariants.py is the CPU/interpret twin)
    from rrtmg_lw_tpu.utils.blackbody import band_anchor
    T_ISO = 288.6
    _, pls_iso = models(icld=0)
    atm_iso = make_atmosphere(ncol=B, nlay=60, dtype=jnp.float32)
    atm_iso = atm_iso._replace(
        tlay=jnp.full_like(jnp.asarray(atm_iso.tlay), T_ISO),
        tlev=jnp.full_like(jnp.asarray(atm_iso.tlev), T_ISO),
        tsfc=jnp.full_like(jnp.asarray(atm_iso.tsfc), T_ISO),
        emis=jnp.ones_like(jnp.asarray(atm_iso.emis)))
    fl_iso = jax.jit(lambda a: pls_iso(a, None))(atm_iso)
    anchor = band_anchor(pls_iso.static_np, T_ISO)
    u_iso = np.asarray(fl_iso.uflx, np.float64)
    record("invariant_isothermal_sfc_vs_blackbody",
           abs(u_iso[:, 0] / anchor - 1).max(), 3e-4,
           dict(anchor_wm2=round(anchor, 4)))
    record("invariant_isothermal_level_envelope",
           abs(u_iso / anchor - 1).max(), 5e-4)

    # ---- compressed wire format (round 4): decoded-on-device inputs
    # must reproduce the direct-input fluxes within the 1e-2 W/m^2
    # quantization budget (absolute; tests/test_wire.py is the CPU
    # twin of this check)
    from rrtmg_lw_tpu.parallel import wire as w
    from rrtmg_lw_tpu.ops.mcica import mcica_subcol_lw_compact

    from rrtmg_lw_tpu.utils.synthetic import make_cloud_profile_fields

    cpf = make_cloud_profile_fields(B, 60)
    wkey = jax.random.key(11)
    _, wire_model = models(icld=2, imca=1, inflag=2, iceflag=3,
                           liqflag=1)

    def wgen(cldfrac, c):
        return mcica_subcol_lw_compact(
            wkey, 2, cldfrac, c["ciwp"], c["clwp"], c["rei"], c["rel"])

    @jax.jit
    def step_direct(a, c):
        return wire_model(a, wgen(c["cldfrac"], c))

    @jax.jit
    def step_wire(ea, ec, tauaer, cldfrac_direct):
        a2 = w.decode_atmosphere(ea, tauaer)
        c2 = w.decode_cloud_profiles(ec, like=a2.play)
        full = wire_model(a2, wgen(c2["cldfrac"], c2))
        same_mask = wire_model(a2, wgen(cldfrac_direct, c2))
        flips = (wgen(c2["cldfrac"], c2).cldfmc
                 != wgen(cldfrac_direct, c2).cldfmc).mean()
        return full, same_mask, flips

    cpj = jax.tree_util.tree_map(jnp.asarray, cpf)
    f_dir = step_direct(atm, cpj)
    f_full, f_same, flips = step_wire(
        w.encode_atmosphere(atm), w.encode_cloud_profiles(cpf),
        jnp.asarray(atm.tauaer), cpj["cldfrac"])
    # continuous-input quantization with identical McICA mask
    # realizations: the true input-noise budget
    err_abs = max(
        np.abs(np.asarray(getattr(f_same, n), np.float64)
               - np.asarray(getattr(f_dir, n), np.float64)).max()
        for n in ("uflx", "dflx", "uflxc", "dflxc"))
    record("model_wire_input_noise_abs_wm2", err_abs, 1e-2,
           dict(units="W/m2 absolute"))
    # full wire: the mask generator is discontinuous in cldfrac, so
    # quantization flips a few sub-column bits — a statistically
    # equivalent cloud sample (same as reseeding the RNG).  Gate the
    # clear-sky fluxes (mask-free) absolutely and the total-sky
    # fluxes in batch mean.
    err_clr = max(
        np.abs(np.asarray(getattr(f_full, n), np.float64)
               - np.asarray(getattr(f_dir, n), np.float64)).max()
        for n in ("uflxc", "dflxc"))
    err_mean = max(
        np.abs(np.asarray(getattr(f_full, n), np.float64).mean(0)
               - np.asarray(getattr(f_dir, n), np.float64).mean(0)
               ).max()
        for n in ("uflx", "dflx"))
    record("model_wire_full_clear_abs_wm2", err_clr, 1e-2,
           dict(units="W/m2 absolute"))
    record("model_wire_full_mean_abs_wm2", err_mean, 5e-3,
           dict(units="W/m2 absolute batch-mean",
                mask_flip_fraction=float(flips)))

    # ---- deep profile (chunked-input + level-cache VMEM plan) ------
    atm_l = make_atmosphere(ncol=256, nlay=140, dtype=jnp.float32)
    mc140 = make_mcica_clouds(ncol=256, nlay=140, dtype=jnp.float32)
    check_model("model_mcica_deep_nlay140",
                dict(icld=2, imca=1, inflag=2, iceflag=3, liqflag=1),
                mc140)

    # ---- production shapes (VERDICT r2 #7): the AB_MATRIX launch
    # defaults (RT tile 256, taumol tile 2048, int8 compact mask) and
    # the maxrand VMEM gate are only exercised at B=16384 — cover the
    # exact bench configuration on-chip.  The XLA reference pipeline
    # materializes several (B, L, 140) arrays and cannot hold B=16k on
    # one chip; columns are independent, so it runs in 2048-column
    # chunks against the full-batch Pallas run.
    def check_model_chunked(name, kw, atm_f, clouds_f, BP, CH=2048):
        try:
            xla, pls = models(**kw)
            fp = jax.jit(lambda a, c: pls(a, c))(atm_f(0, BP),
                                                 clouds_f(0, BP))
            jax.block_until_ready(fp.uflx)
            run_x = jax.jit(lambda a, c: xla(a, c))
            parts = []
            for i in range(0, BP, CH):
                fx = run_x(atm_f(i, CH), clouds_f(i, CH))
                parts.append({n: np.asarray(getattr(fx, n), np.float64)
                              for n in ("uflx", "dflx", "uflxc",
                                        "dflxc")})
            err = 0.0
            for n in ("uflx", "dflx", "uflxc", "dflxc"):
                x = np.concatenate([p[n] for p in parts], axis=0)
                y = np.asarray(getattr(fp, n), np.float64)
                scale = max(np.abs(x).max(), 1.0)
                err = max(err, np.abs(x - y).max() / scale)
            record(name, err, FLUX_TOL, dict(batch=BP))
        except Exception as e:           # pragma: no cover
            RESULTS.append(dict(check=name, max_err=float("nan"),
                                tol=float(FLUX_TOL), ok=False,
                                error=f"{type(e).__name__}: {e}"[:300]))
            print(f"FAIL  {name:42s} {type(e).__name__}")

    if not args.smoke:
        BP = 16384
        atm16 = make_atmosphere(ncol=BP, nlay=60, dtype=jnp.float32)
        mcp = make_mcica_clouds(ncol=BP, nlay=60, dtype=jnp.float32,
                                layout="compact", mask_dtype=np.int8)
        bcp = make_band_clouds(ncol=BP, nlay=60, dtype=jnp.float32)

        def slc(tree, i, n):
            import jax.tree_util as jtu
            return jtu.tree_map(
                lambda x: x[..., i:i + n] if (
                    hasattr(x, "ndim") and x.ndim == 3
                    and x.shape[-1] == BP) else x[i:i + n], tree)

        check_model_chunked(
            "model_mcica_compact_i8_B16k",
            dict(icld=2, imca=1, inflag=2, iceflag=3, liqflag=1),
            lambda i, n: slc(atm16, i, n), lambda i, n: slc(mcp, i, n),
            BP)
        check_model_chunked(
            "model_maxrand_icld2_B16k",
            dict(icld=2, imca=0, inflag=2, iceflag=3, liqflag=1),
            lambda i, n: slc(atm16, i, n), lambda i, n: slc(bcp, i, n),
            BP)

    out = dict(backend=backend, device=dev, batch=B,
               elapsed_s=round(time.time() - t0, 1),
               split_tol=SPLIT_TOL, flux_tol=FLUX_TOL,
               all_ok=all(r["ok"] for r in RESULTS), checks=RESULTS)
    # a CPU smoke must never clobber a committed on-chip artifact
    default = ("/tmp/TPU_VERIFY_smoke.json" if args.smoke
               else ROOT / f"TPU_VERIFY_r{args.round:02d}.json")
    path = args.out or default
    pathlib.Path(path).write_text(json.dumps(out, indent=1))
    print(f"\n{'ALL PASS' if out['all_ok'] else 'FAILURES'} "
          f"-> {path} ({out['elapsed_s']}s)")
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
