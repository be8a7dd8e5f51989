"""Run the reference's 14-case golden regression suite through the
column-mode CLI and compare against committed outputs.

Case matrix from run_examples_std_atm/script.run_std_atm:1-66.

Comparison modes:
- Default (no --golden-dir): compare against the reference's committed
  outputs in /root/reference/run_examples_std_atm.  With the real
  k-tables installed (assets/ktables_real.npz) the gate is the
  reference accuracy contract: fluxes <= 0.5 W/m2, heating rates
  <= 0.1 K/day; with synthetic tables the values differ by design so
  only structure is gated and diffs are reported.
- --golden-dir DIR: compare against DIR/output_rrtm_<name> and ALWAYS
  gate values (same comparison code as the real-table path).  Used in
  CI against the committed framework-generated synthetic goldens
  (goldens_synthetic/) with tightened tolerances — this keeps the full
  real-data acceptance path (parser -> RRTATM -> radiation -> writer ->
  golden comparator -> exit code) executing even though the real
  k-tables are absent from this environment.
- --write DIR: run all cases and write DIR/output_rrtm_<name>
  (golden-generation mode; no comparison).

Usage: python tools/run_goldens.py [--nmca N] [--cases a,b,...]
           [--golden-dir DIR | --write DIR]
           [--tol-flux X] [--tol-htr X] [--json OUT]
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
    ap.add_argument("--golden-dir", default=None,
                    help="compare against DIR/output_rrtm_<name> and "
                         "gate VALUES regardless of k-table kind")
    ap.add_argument("--write", default=None, metavar="DIR",
                    help="golden-generation mode: write "
                         "DIR/output_rrtm_<name>, no comparison")
    ap.add_argument("--tol-flux", type=float, default=0.5,
                    help="flux gate in W/m2 (reference contract 0.5)")
    ap.add_argument("--tol-htr", type=float, default=0.1,
                    help="heating-rate gate in K/day (contract 0.1)")
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

    golden_dir = pathlib.Path(args.golden_dir) if args.golden_dir else REF
    gate_values = is_real or args.golden_dir is not None
    write_dir = pathlib.Path(args.write) if args.write else None
    if write_dir:
        write_dir.mkdir(parents=True, exist_ok=True)

    results = {}
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="rrtmg_goldens_"))
    sel = args.cases.split(",") if args.cases else None
    ok = True
    for name, inp, cld, aer in CASES:
        if sel and not any(s in name for s in sel):
            continue
        t0 = time.time()
        out = (write_dir / f"output_rrtm_{name}") if write_dir \
            else tmp / f"output_{name}"
        run_files(REF / inp, out,
                  cld_path=REF / cld if cld else None,
                  aer_path=REF / aer if aer else None,
                  nmca=args.nmca)
        if write_dir:
            results[name] = dict(status="written",
                                 seconds=round(time.time() - t0, 1))
            print(f"{name:32s} written  ({results[name]['seconds']}s)")
            continue
        try:
            diffs = compare_outputs(out, golden_dir / f"output_rrtm_{name}")
            status = "structural-ok"
            if gate_values:
                passed = (diffs["uflx"] <= args.tol_flux
                          and diffs["dflx"] <= args.tol_flux
                          and diffs["htr"] <= args.tol_htr)
                status = "PASS" if passed else "FAIL"
                ok = ok and passed
            results[name] = dict(status=status, **diffs,
                                 seconds=round(time.time() - t0, 1))
        except (ValueError, OSError) as e:
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
