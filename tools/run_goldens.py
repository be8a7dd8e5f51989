"""Run the reference's 14-case golden regression suite through the
column-mode CLI and compare against the committed outputs.

Case matrix from run_examples_std_atm/script.run_std_atm:1-66.

With the real k-tables installed (assets/ktables_real.npz) the gate is
the reference accuracy contract: fluxes <= 0.5 W/m2, heating rates
<= 0.1 K/day.  With synthetic tables the numbers differ by design; the
harness still validates structure (block/level counts, pressures) and
reports the diffs.

Usage: python tools/run_goldens.py [--nmca N] [--cases a,b,...]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference/run_examples_std_atm")

CASES = [
    ("ICRCCM_sonde", "input_rrtm_ICRCCM_sonde", None, None),
    ("MLS-cld5-imca0-icld2", "input_rrtm_MLS-cld-imca0-icld2",
     "in_cld_rrtm-cld5", None),
    ("MLS-cld5-imca1-icld2", "input_rrtm_MLS-cld-imca1-icld2",
     "in_cld_rrtm-cld5", None),
    ("MLS-cld7-imca1-icld2", "input_rrtm_MLS-cld-imca1-icld2",
     "in_cld_rrtm-cld7", None),
    ("MLS-cld7-imca1-icld4-idcor0", "input_rrtm_MLS-cld-imca1-icld4-idcor0",
     "in_cld_rrtm-cld7", None),
    ("MLS-cld7-imca1-icld5-idcor0", "input_rrtm_MLS-cld-imca1-icld5-idcor0",
     "in_cld_rrtm-cld7", None),
    ("MLS-cld7-imca1-icld5-idcor1", "input_rrtm_MLS-cld-imca1-icld5-idcor1",
     "in_cld_rrtm-cld7", None),
    ("MLS-clr", "input_rrtm_MLS-clr", None, None),
    ("MLS-clr-aer12", "input_rrtm_MLS-clr-aer12", None,
     "in_aer_rrtm-aer12"),
    ("MLS-clr-xsec", "input_rrtm_MLS-clr-xsec", None, None),
    ("MLS-clr-idrv1", "input_rrtm_MLS-clr-idrv1", None, None),
    ("MLW-clr", "input_rrtm_MLW-clr", None, None),
    ("SAW-clr", "input_rrtm_SAW-clr", None, None),
    ("TROP-clr", "input_rrtm_TROP-clr", None, None),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmca", type=int, default=200)
    ap.add_argument("--cases", default=None,
                    help="comma-separated substring filters")
    ap.add_argument("--json", default=None, help="write results here")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from rrtmg_lw_tpu.cli import run_files
    from rrtmg_lw_tpu.data.ktables import load_ktables
    from rrtmg_lw_tpu.io.golden import compare_outputs

    _, is_real = load_ktables()
    kind = "REAL" if is_real else "SYNTHETIC (values will not match goldens)"
    print(f"k-tables: {kind}")

    results = {}
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="rrtmg_goldens_"))
    sel = args.cases.split(",") if args.cases else None
    ok = True
    for name, inp, cld, aer in CASES:
        if sel and not any(s in name for s in sel):
            continue
        t0 = time.time()
        out = tmp / f"output_{name}"
        run_files(REF / inp, out,
                  cld_path=REF / cld if cld else None,
                  aer_path=REF / aer if aer else None,
                  nmca=args.nmca)
        try:
            diffs = compare_outputs(out, REF / f"output_rrtm_{name}")
            status = "structural-ok"
            if is_real:
                passed = diffs["uflx"] <= 0.5 and diffs["dflx"] <= 0.5 \
                    and diffs["htr"] <= 0.1
                status = "PASS" if passed else "FAIL"
                ok = ok and passed
            results[name] = dict(status=status, **diffs,
                                 seconds=round(time.time() - t0, 1))
        except ValueError as e:
            results[name] = dict(status=f"STRUCT-FAIL: {e}")
            ok = False
        r = results[name]
        print(f"{name:32s} {r['status']:14s} "
              + " ".join(f"{k}={r[k]:.4g}" for k in
                         ("uflx", "dflx", "htr") if k in r)
              + f"  ({r.get('seconds', '?')}s)")
    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(results, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
