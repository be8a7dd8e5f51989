"""Native (C++) acceleration for host-side work.

Components (see native/*.cc; loaded via ctypes, built on demand with
g++ when the shared object is missing; every native entry point has a
pure-Python/numpy fallback so the framework never hard-requires the
toolchain):

  fparse    — Fortran numeric-literal scanner (data-asset pipeline)
  wirecodec — streaming wire-format encoders (parallel/wire.py); run
              per-batch on the prefetch thread, bit-identical to the
              numpy reference encoders
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


def _stale(so: pathlib.Path) -> bool:
    """True when the shared object is missing or older than any source
    in native/ — a committed prebuilt .so must never shadow an edited
    .cc (divergence would otherwise surface only via the numpy-parity
    tests, after the fact)."""
    if not so.exists():
        return True
    so_mtime = so.stat().st_mtime
    srcs = list(_NATIVE_DIR.glob("*.cc")) + [_NATIVE_DIR / "Makefile"]
    return any(s.exists() and s.stat().st_mtime > so_mtime
               for s in srcs)


def _build_if_stale(so: pathlib.Path) -> bool:
    if _stale(so):
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return so.exists()          # stale-but-present still loads
    return so.exists()


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _build_if_stale(_SO):
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


# ---------------------------------------------------------------------------
# wirecodec — streaming wire-format encoders (parallel/wire.py)
# ---------------------------------------------------------------------------
_WSO = _NATIVE_DIR / "libwirecodec.so"
_wlib = None
_wtried = False


def _wload():
    global _wlib, _wtried
    if _wtried:
        return _wlib
    _wtried = True
    if not _build_if_stale(_WSO):
        return None
    try:
        lib = ctypes.CDLL(str(_WSO))
        pd = ctypes.POINTER(ctypes.c_double)
        pu = ctypes.POINTER(ctypes.c_uint16)
        lib.wc_enc_logratio.restype = ctypes.c_longlong
        lib.wc_enc_logratio.argtypes = [pd, ctypes.c_longlong,
                                        ctypes.c_longlong, pd, pd, pu]
        lib.wc_enc_delta.restype = None
        lib.wc_enc_delta.argtypes = lib.wc_enc_logratio.argtypes
        _wlib = lib
    except OSError:
        _wlib = None
    return _wlib


def _wcall(fn_name, x):
    """Shared driver: x (B, ...) float64 C-contiguous -> (codes uint16,
    ref float64 (inner...), (lo, hi)) or None if native unavailable."""
    lib = _wload()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float64)
    B = x.shape[0]
    inner = x.shape[1:]
    K = int(np.prod(inner, dtype=np.int64)) if inner else 1
    ref = np.empty(max(K, 1), np.float64)
    rng = np.empty(2, np.float64)
    u = np.empty((B, max(K, 1)), np.uint16)
    pd = ctypes.POINTER(ctypes.c_double)
    pu = ctypes.POINTER(ctypes.c_uint16)
    res = getattr(lib, fn_name)(
        x.reshape(B, K).ctypes.data_as(pd), B, K,
        ref.ctypes.data_as(pd), rng.ctypes.data_as(pd),
        u.ctypes.data_as(pu))
    return (u.reshape((B,) + inner), ref.reshape(inner),
            float(rng[0]), float(rng[1]), res)


def wire_enc_logratio(x):
    """Native logratio encoder or None; see wirecodec.cc."""
    return _wcall("wc_enc_logratio", x)


def wire_enc_delta(x):
    return _wcall("wc_enc_delta", x)


def wire_available() -> bool:
    return _wload() is not None
