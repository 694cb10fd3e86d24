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
    p64 = ctypes.POINTER(ctypes.c_uint64)
    p32 = ctypes.POINTER(ctypes.c_uint32)
    lib.pvw_decrypt_decode_pairs.restype = ctypes.c_int
    lib.pvw_decrypt_decode_pairs.argtypes = [
        p64, p32, p32, p32, p32,          # sk, c1 hi/lo, c2 hi/lo
        ctypes.c_int64,                   # d
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # k, L, ell
        p64,                              # moduli
        p64,                              # ntt_inv
        p64, p64, p64, p64,               # qhat_inv/qhat_words/q/dpow words
        ctypes.c_int32,                   # nw
        ctypes.c_uint64,                  # delta
        p64,                              # out
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


@lru_cache(maxsize=16)
def _inv_tables(ring):
    """Stacked inverse-NTT matrices uint64 [L, l, l] for the host decrypt."""
    return np.ascontiguousarray(
        np.stack([lp.ntt_inv for lp in ring.limbs]), dtype=np.uint64)


def decrypt_decode_supported(params) -> bool:
    """True when the full host decrypt (:func:`decrypt_decode_pairs_native`) can
    run this parameter set: native lib built, delta < 2^63, q within the
    word budget, every modulus < 2^62 (lazy-accumulator headroom)."""
    if _lib() is None or _ctx_tables(params) is None:
        return False
    return all(m < 1 << 62 for m in params.ring.moduli)


@lru_cache(maxsize=16)
def _decrypt_static_args(params):
    """Pre-marshalled ctypes pointers for the per-params constant tables
    (the pointer conversions cost ~0.5 us each; the single-message path
    counts those)."""
    tables = _ctx_tables(params)
    if tables is None or any(m >= 1 << 62 for m in params.ring.moduli):
        return None
    moduli, qhat_inv, qhat_words, q_words, dpow_words, nw, delta = tables
    inv = _inv_tables(params.ring)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    # the cache entry also owns the arrays, keeping the pointers alive
    return (moduli.ctypes.data_as(p64), inv.ctypes.data_as(p64),
            qhat_inv.ctypes.data_as(p64), qhat_words.ctypes.data_as(p64),
            q_words.ctypes.data_as(p64), dpow_words.ctypes.data_as(p64),
            nw, delta, (moduli, inv, qhat_inv, qhat_words, q_words,
                        dpow_words))


def decrypt_decode_pairs_native(sk_res: np.ndarray, c1h, c1l, c2h, c2l,
                                params) -> list[int] | None:
    """Full host decryption from uint32 hi/lo pairs in the library's
    NATIVE layouts — sk_res uint64 [k, L, l]; c1 pair [k, d, L, l];
    c2 pair [d, L, l] — no 64-bit join or axis moves on the Python side
    (the single-message latency path). Returns None if unsupported."""
    lib = _lib()
    if lib is None:
        return None
    statics = _decrypt_static_args(params)
    if statics is None:
        return None
    # np.asarray of accelerator arrays (and ufunc outputs over them) can
    # carry non-C-contiguous strides; .ctypes.data on such an array
    # silently hands C++ the base buffer in the wrong element order
    sk_res = np.ascontiguousarray(sk_res, np.uint64)
    c1h = np.ascontiguousarray(c1h, np.uint32)
    c1l = np.ascontiguousarray(c1l, np.uint32)
    c2h = np.ascontiguousarray(c2h, np.uint32)
    c2l = np.ascontiguousarray(c2l, np.uint32)
    k, d = c1h.shape[0], c1h.shape[1]
    out = np.zeros(d, np.uint64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    p32 = ctypes.POINTER(ctypes.c_uint32)
    rc = lib.pvw_decrypt_decode_pairs(
        sk_res.ctypes.data_as(p64),
        c1h.ctypes.data_as(p32), c1l.ctypes.data_as(p32),
        c2h.ctypes.data_as(p32), c2l.ctypes.data_as(p32),
        d, k, params.ring.num_limbs, params.l, *statics[:8],
        out.ctypes.data_as(p64),
    )
    if rc != 0:
        return None
    return [int(v) for v in out]


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
