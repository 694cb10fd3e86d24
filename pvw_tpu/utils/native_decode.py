"""ctypes bridge to the native C++ decode engine (native/pvw_decode.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp), caches it next
to the source, and falls back to the exact Python decoder transparently if
the toolchain or configuration is unsupported (delta >= 2^63, q > 1152
bits). Correctness is enforced by differential tests against the Python
oracle (tests/test_native_decode.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from functools import lru_cache

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pvw_decode.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libpvw_decode.so")
_lock = threading.Lock()

MAX_NW = 18


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception as e:  # noqa: BLE001
        print(f"[pvw-tpu] native decode build failed ({e}); "
              "falling back to Python decode", file=sys.stderr)
        return None


@lru_cache(maxsize=1)
def _lib():
    with _lock:
        path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.pvw_decode_batch.restype = ctypes.c_int
    lib.pvw_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),  # residues
        ctypes.c_int64,                   # count
        ctypes.c_int32,                   # L
        ctypes.c_int32,                   # ell
        ctypes.POINTER(ctypes.c_uint64),  # moduli
        ctypes.POINTER(ctypes.c_uint64),  # qhat_inv
        ctypes.POINTER(ctypes.c_uint64),  # qhat_words
        ctypes.POINTER(ctypes.c_uint64),  # q_words
        ctypes.POINTER(ctypes.c_uint64),  # dpow_words
        ctypes.c_int32,                   # nw
        ctypes.c_uint64,                  # delta
        ctypes.POINTER(ctypes.c_uint64),  # out
    ]
    return lib


def _words(x: int, nw: int) -> np.ndarray:
    out = np.zeros(nw, np.uint64)
    for i in range(nw):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64
    if x:
        raise OverflowError("value exceeds word budget")
    return out


@lru_cache(maxsize=16)
def _ctx_tables(params):
    """Precompute the per-params constant tables for the C call."""
    ring = params.ring
    q = params.q_total()
    nw = (q.bit_length() + 63) // 64
    if nw > MAX_NW:
        return None
    delta = params.delta()
    if delta >= 1 << 63:
        return None
    moduli = np.array(ring.moduli, np.uint64)
    qhat_inv = np.array(ring.crt.qhat_inv, np.uint64)
    qhat_words = np.stack([_words(h, nw) for h in ring.crt.qhat])
    q_words = _words(q, nw)
    dpow_words = _words(params.delta_power_l_minus_1() % q, nw)
    return (moduli, qhat_inv, np.ascontiguousarray(qhat_words), q_words,
            dpow_words, nw, delta)


def decode_batch_native(residues: np.ndarray, params) -> list[int] | None:
    """Decode [d, L, l] residues. Returns None if unsupported (caller falls
    back to the Python oracle)."""
    lib = _lib()
    if lib is None:
        return None
    tables = _ctx_tables(params)
    if tables is None:
        return None
    moduli, qhat_inv, qhat_words, q_words, dpow_words, nw, delta = tables
    res = np.ascontiguousarray(residues, np.uint64)
    d = res.shape[0]
    out = np.zeros(d, np.uint64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    rc = lib.pvw_decode_batch(
        res.ctypes.data_as(p64), d, params.ring.num_limbs, params.l,
        moduli.ctypes.data_as(p64), qhat_inv.ctypes.data_as(p64),
        qhat_words.ctypes.data_as(p64), q_words.ctypes.data_as(p64),
        dpow_words.ctypes.data_as(p64), nw, delta,
        out.ctypes.data_as(p64),
    )
    if rc != 0:
        return None
    return [int(v) for v in out]
