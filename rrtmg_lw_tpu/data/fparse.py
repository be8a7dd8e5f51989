"""Parser for Fortran array DATA/assignment statements.

Used once, offline, by ``tools/build_assets.py`` to extract the numeric
tables that the reference stores as Fortran source-level data statements
(e.g. the Planck integrals in ``rrtmg_lw_setcoef.f90:600-2009`` and the
cloud optics tables in ``rrtmg_lw_init.f90:2037-2675``).  These are *data*,
not code: the arrays themselves define the model physics and must match
the reference exactly for golden-file parity.

The parser understands the two assignment forms used throughout the
reference source::

    name(:) = (/ v1_rb, v2_rb, ... /)          ! with & continuations
    name(1:50, 2) = (/ ... /)
    name(3, 1:12) = (/ ... /)
    name = 0.0602410_rb                        ! scalar

plus the legacy fixed-form ``data name /v1, v2, .../`` statements found in
``rrtatm.f``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

_NUM_RE = re.compile(
    r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?(?:_\w+)?"
)


def _to_float(tok: str) -> float:
    tok = tok.split("_")[0].replace("d", "e").replace("D", "E")
    return float(tok)


def strip_fortran(text: str) -> str:
    """Remove comments and join continuation lines (free-form F90)."""
    out_lines = []
    for raw in text.splitlines():
        # strip trailing comment (no strings-with-! appear in data stmts)
        line = raw.split("!", 1)[0]
        out_lines.append(line)
    joined = []
    buf = ""
    for line in out_lines:
        s = line.rstrip()
        if not s.strip():
            continue
        if buf:
            buf += " " + s.strip().lstrip("&")
        else:
            buf = s.strip()
        if buf.endswith("&"):
            buf = buf[:-1].rstrip()
            continue
        joined.append(buf)
        buf = ""
    if buf:
        joined.append(buf)
    return "\n".join(joined)


@dataclass
class FortranArrays:
    """Registry of declared arrays, filled from parsed assignments.

    ``decls`` maps name -> list of (lower, upper) inclusive bounds per dim,
    mirroring the Fortran declaration (e.g. ``kbo(5,13:59,16)`` ->
    ``[(1,5),(13,59),(1,16)]``).  Arrays are stored in C order with the
    same dimension order as the Fortran declaration; element (i,j,..) of
    the Fortran array lives at [i-lo0, j-lo1, ...].
    """

    decls: dict = field(default_factory=dict)
    values: dict = field(default_factory=dict)
    scalars: dict = field(default_factory=dict)

    def declare(self, name: str, bounds: list[tuple[int, int]]):
        self.decls[name] = bounds
        shape = tuple(hi - lo + 1 for lo, hi in bounds)
        self.values[name] = np.full(shape, np.nan, dtype=np.float64)

    def _parse_index(self, name: str, argstr: str):
        bounds = self.decls[name]
        args = [a.strip() for a in argstr.split(",")]
        if len(args) != len(bounds):
            raise ValueError(f"{name}: rank mismatch {args} vs {bounds}")
        idx = []
        for a, (lo, hi) in zip(args, bounds):
            if a == ":":
                idx.append(slice(0, hi - lo + 1))
            elif ":" in a:
                a0, a1 = a.split(":")
                idx.append(slice(int(a0) - lo, int(a1) - lo + 1))
            else:
                idx.append(int(a) - lo)
        return tuple(idx)

    def fill_from(self, text: str, names=None):
        """Scan (already-stripped) source text for assignments to known arrays."""
        wanted = set(names) if names is not None else set(self.decls)
        # array assignments; the optional reshape((/.../), (/dims/))
        # wrapper is transparent — Fortran reshape fills column-major,
        # exactly how the indexed slice is filled below (the public
        # rrtmg_lw_k_g.f90 uses this form for the multi-dim k tables)
        pat = re.compile(
            r"(?<![\w%])(\w+)\s*(?:\(([^()]*)\))?\s*=\s*"
            r"(?:reshape\s*\(\s*)?\(/(.*?)/\)",
            re.DOTALL,
        )
        for m in pat.finditer(text):
            name = m.group(1).lower()
            if name not in wanted or name not in self.decls:
                continue
            if m.group(2) is None:       # whole-array assignment
                idx = tuple(slice(0, hi - lo + 1)
                            for lo, hi in self.decls[name])
            else:
                idx = self._parse_index(name, m.group(2))
            vals = np.array(
                [_to_float(t) for t in _NUM_RE.findall(m.group(3))],
                dtype=np.float64,
            )
            target = self.values[name][idx]
            self.values[name][idx] = vals.reshape(target.shape, order="F") \
                if target.ndim > 1 else vals
        # scalar assignments like `abscld1 = 0.0602410_rb`
        spat = re.compile(
            r"^\s*(\w+)\s*=\s*(" + _NUM_RE.pattern + r")\s*$", re.MULTILINE
        )
        for m in spat.finditer(text):
            name = m.group(1).lower()
            if names is None or name in wanted:
                self.scalars[name] = _to_float(m.group(2))

    def get(self, name: str) -> np.ndarray:
        v = self.values[name]
        if np.isnan(v).any():
            raise ValueError(f"array {name} not fully filled "
                             f"({np.isnan(v).sum()}/{v.size} missing)")
        return v
