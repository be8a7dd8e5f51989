#!/usr/bin/env python
"""Extract the 6 built-in AFGL standard-atmosphere profiles from the
reference's atmosphere builder (rrtatm.f, BLOCK DATA MLATMB at
rrtatm.f:1812-2914) into ``rrtmg_lw_tpu/assets/std_atmos.npz``.

Arrays (50 levels each, rrtatm.f:1858-):
  alt(50)        level altitudes, km
  pmdl(6,50)     pressure, mb, per model 1..6
  tmdl(6,50)     temperature, K
  amol(6,8,50)   molecules 1..7 vmr in ppmv; index 8 = total air
                 number density (cm-3)
  trac(21,50)    trace molecules 8..28 vmr in ppmv (US-std profile only)

These are public AFGL reference-atmosphere data (AFCRL-72-0497 / U.S.
Standard Atmosphere 1976), extracted rather than re-typed so they match
the reference bit-for-bit.

Usage:  python tools/build_stdatm.py [--reference /root/reference]
"""

import argparse
import pathlib
import re
import sys

import numpy as np

_NUM = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?")

# TRAC common-block order (rrtatm.f:1844-1848): molecules 8..28
TRAC_NAMES = ["ANO", "SO2", "ANO2", "ANH3", "HNO3", "OH", "HF", "HCL",
              "HBR", "HI", "CLO", "OCS", "H2CO", "HOCL", "AN2", "HCN",
              "CH3CL", "H2O2", "C2H2", "C2H6", "PH3"]


def join_fixed_form(text: str) -> str:
    """Fixed-form F77: strip sequence field (cols 73+), join continuation
    lines (col 6 non-blank), drop comments (C/c/* in col 1)."""
    stmts = []
    for raw in text.splitlines():
        if raw[:1] in ("C", "c", "*", "!"):
            continue
        line = raw[:72].rstrip()
        if not line.strip():
            continue
        if len(line) > 5 and line[5] not in (" ", "0"):
            stmts[-1] += line[6:]
        else:
            stmts.append(line)
    return "\n".join(stmts)


def parse_data_blocks(src: str, names) -> dict:
    """Extract DATA <name> / v1, v2, ... / numeric blocks (first 50)."""
    out = {}
    wanted = {n.upper() for n in names}
    for m in re.finditer(r"DATA\s+(\w+)\s*/([^/]*)/", src):
        name = m.group(1).upper()
        if name not in wanted or name in out:
            continue
        body = m.group(2)
        # drop the MXZ50*0.0 trailing repeat-fill
        body = re.sub(r"\w+\s*\*\s*[\d.+-]+", "", body)
        vals = [float(t.replace("D", "E").replace("d", "e"))
                for t in _NUM.findall(body)]
        if len(vals) < 50:
            continue  # sentinel-fill block (e.g. 50*-99.), not the profile
        out[name] = np.array(vals[:50], dtype=np.float64)
    missing = wanted - set(out)
    if missing:
        raise SystemExit(f"missing DATA blocks: {sorted(missing)}")
    return out


def parse_xmlatm(src_joined: str) -> dict:
    """Extract ALTX + AMOL1..AMOL14 from BLOCK DATA XMLATM (the standard
    volume-mixing-ratio profiles of the cross-section molecules,
    rrtatm.f:7008-).  Names AMOL11..AMOL38 collide with MLATMB's
    model-atmosphere arrays, so parse only the XMLATM section.  Repeat
    fills (``50*-99.`` for molecules without data, ``MXZ50*0.0``) are
    expanded, keeping the first 50 levels."""
    sec = src_joined[src_joined.index("BLOCK DATA XMLATM"):]
    out = {}
    for m in re.finditer(r"DATA\s+(ALTX|AMOL\d+)\s*/([^/]*)/", sec):
        name = m.group(1).upper()
        vals = []
        for tok in m.group(2).split(","):
            tok = tok.strip()
            if not tok:
                continue
            if "*" in tok:
                n, v = tok.split("*")
                n = 0 if n.strip() == "MXZ50" else int(n)
                vals.extend([float(v)] * n)
            else:
                vals.append(float(tok.replace("D", "E").replace("d", "e")))
        if len(vals) >= 50:
            out[name] = np.array(vals[:50], dtype=np.float64)
    return out


def build(ref: pathlib.Path) -> dict:
    src = join_fixed_form((ref / "src/rrtatm.f").read_text())
    names = (["ALT"]
             + [f"P{m}" for m in range(1, 7)]
             + [f"T{m}" for m in range(1, 7)]
             + [f"AMOL{m}{k}" for m in range(1, 7) for k in range(1, 9)]
             + TRAC_NAMES)
    d = parse_data_blocks(src, names)
    for n, v in d.items():
        if v.size != 50:
            raise SystemExit(f"{n}: got {v.size} values, expected 50")
    pmdl = np.stack([d[f"P{m}"] for m in range(1, 7)])
    tmdl = np.stack([d[f"T{m}"] for m in range(1, 7)])
    amol = np.stack([np.stack([d[f"AMOL{m}{k}"] for k in range(1, 9)])
                     for m in range(1, 7)])
    trac = np.stack([d[n] for n in TRAC_NAMES])
    x = parse_xmlatm(src)
    amolx = np.stack([x[f"AMOL{k}"] for k in range(1, 15)])
    return dict(alt=d["ALT"], pmdl=pmdl, tmdl=tmdl, amol=amol, trac=trac,
                altx=x["ALTX"], amolx=amolx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    ref = pathlib.Path(args.reference)
    tables = build(ref)
    out = (pathlib.Path(__file__).resolve().parents[1]
           / "rrtmg_lw_tpu/assets/std_atmos.npz")
    np.savez_compressed(out, **tables)
    for k, v in tables.items():
        print(f"{k:6s} {v.shape} [{v.min():.4g}, {v.max():.4g}]")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
