"""Native (C++) acceleration for host-side work.

Currently: fparse — the Fortran numeric-literal scanner used by the
data-asset pipeline (see native/fparse.cc).  Loaded via ctypes; built
on demand with g++ if the shared object is missing.  Every native entry
point has a pure-Python fallback, so the framework never hard-requires
the toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libfparse.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.fparse_extract_numbers.restype = ctypes.c_int64
        lib.fparse_extract_numbers.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def extract_numbers(text: str) -> np.ndarray:
    """All Fortran numeric literals in ``text`` as float64 (native if
    available, regex fallback otherwise)."""
    lib = _load()
    if lib is None:
        return _extract_numbers_py(text)
    raw = text.encode()
    # size pass, then fill
    n = lib.fparse_extract_numbers(raw, len(raw), None, 0)
    out = np.empty(n, np.float64)
    m = lib.fparse_extract_numbers(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n)
    assert m == n
    return out


def _extract_numbers_py(text: str) -> np.ndarray:
    import re
    num = re.compile(
        r"([+-]?)(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?(?:_\w+)?")
    stripped = "\n".join(l.split("!", 1)[0] for l in text.splitlines())
    vals = []
    pos = 0
    while True:
        m = num.search(stripped, pos)
        if m is None:
            break
        tok = m.group(0)
        if m.group(1):
            # sign is unary only if the previous significant character
            # is not operand-like (digit/./)/identifier) — the native
            # scanner's prev_sig rule
            k = m.start() - 1
            while k >= 0 and stripped[k] in " \t\r\n&":
                k -= 1
            if k >= 0 and (stripped[k].isalnum()
                           or stripped[k] in "._)"):
                tok = tok[1:]          # binary operator, not a sign
        t = tok.split("_")[0].replace("d", "e").replace("D", "E")
        vals.append(float(t))
        pos = m.end()
    return np.asarray(vals, np.float64)


def available() -> bool:
    return _load() is not None
