"""Exact multiword (u32-word) integer arithmetic for the on-device decode.

The PVW sequential-rounding decode (``decryption.rs:10-58``) is exact
multiprecision arithmetic on CRT-lifted centered coefficients — up to
~1100-bit values for the 17-limb chains. Round 1 ran it on the host
(Python ints / the C++ engine in ``native/pvw_decode.cpp``), which capped
end-to-end decryption ~26x below the device inner-product stage. This
module provides the device-side substrate: unsigned multiword magnitudes
as ``uint32`` arrays with a trailing little-endian word axis, plus a
carry-save accumulator so long accumulations vectorize over the word axis
and carries propagate in ONE final pass.

Division — which TPUs lack entirely for integers — never happens at
runtime: every divisor in the decode (Δ, 2Δ, Δ^(l-1)) is a static
parameter constant, so quotients/remainders use Barrett-style
multiplication by a host-precomputed reciprocal ``R = floor(2^F / D)``
with a provable error of at most one (corrected by a single conditional
step); see :func:`div_by_static` / :func:`mod_by_static`.

All functions are shape-polymorphic jnp ops: magnitudes are
``uint32[..., NW]``, predicates broadcast over the leading batch dims.
Everything works under ``jit`` and on the CPU backend alike.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import u64 as u64op

U32 = jnp.uint32


# --------------------------------------------------------------------------
# host helpers
# --------------------------------------------------------------------------

def words_from_int(value: int, nw: int) -> np.ndarray:
    """Python int >= 0 -> uint32[nw] little-endian words (checked fit)."""
    if value < 0:
        raise ValueError("magnitude must be non-negative")
    out = np.zeros(nw, np.uint32)
    v = int(value)
    for i in range(nw):
        out[i] = v & 0xFFFFFFFF
        v >>= 32
    if v:
        raise OverflowError(f"value needs more than {nw} words")
    return out


def int_from_words(words: np.ndarray) -> int:
    """uint32[..., NW] -> Python int (host, for tests)."""
    w = np.asarray(words, np.uint64)
    acc = 0
    for i in range(w.shape[-1] - 1, -1, -1):
        acc = (acc << 32) | int(w[..., i])
    return acc


def nw_for_bits(bits: int) -> int:
    """Word count holding any value below 2^bits."""
    return max(1, (int(bits) + 31) // 32)


# --------------------------------------------------------------------------
# carry-save accumulator
# --------------------------------------------------------------------------
# An accumulator is a pair (h, l) of uint32[..., NP]: partial[w] =
# h[w]*2^32 + l[w] and value = sum_w partial[w] * 2^(32w). Each add below
# increases a partial by < 2^38; callers keep the add count per position
# far below 2^25, so partials never overflow 2^63 and the final
# propagation carry always fits uint32.

def acc_zero(shape: tuple, npos: int):
    z = jnp.zeros(shape + (npos,), U32)
    return z, z


def acc_add_u32(acc, contrib, offset: int):
    """Add uint32 word contributions [..., NWc] at word position offset."""
    h, l = acc
    npos = l.shape[-1]
    nwc = contrib.shape[-1]
    pad = [(0, 0)] * (contrib.ndim - 1) + [(offset, npos - offset - nwc)]
    c = jnp.pad(contrib, pad)
    nl = l + c
    nh = h + (nl < l).astype(U32)
    return nh, nl


def acc_add_sum32(acc, lo16_sum, hi16_sum, offset: int):
    """Add per-position sums of 16-bit halves (each < 2^31, int32/uint32)
    at word position offset — the vectorized-reduction entry point: split
    many u32 contributions into 16-bit halves, ``jnp.sum`` them exactly in
    32 bits, then fold the two sums in here."""
    h, l = acc
    lo16_sum = lo16_sum.astype(U32)
    hi16_sum = hi16_sum.astype(U32)
    v_l = lo16_sum + (hi16_sum << 16)
    carry_a = (v_l < lo16_sum).astype(U32)          # wrap of the shifted add
    v_h = (hi16_sum >> 16) + carry_a
    npos = l.shape[-1]
    nwc = v_l.shape[-1]
    pad = [(0, 0)] * (v_l.ndim - 1) + [(offset, npos - offset - nwc)]
    v_l = jnp.pad(v_l, pad)
    v_h = jnp.pad(v_h, pad)
    nl = l + v_l
    nh = h + v_h + (nl < l).astype(U32)
    return nh, nl


def acc_propagate(acc, nw_out: int):
    """Resolve the carry-save form into normalized uint32[..., nw_out]."""
    h, l = acc
    npos = l.shape[-1]
    carry = jnp.zeros(l.shape[:-1], U32)
    words = []
    for w in range(nw_out):
        if w < npos:
            s_l = l[..., w] + carry
            c0 = (s_l < carry).astype(U32)
            carry = h[..., w] + c0
        else:
            s_l = carry
            carry = jnp.zeros_like(carry)
        words.append(s_l)
    return jnp.stack(words, axis=-1)


# --------------------------------------------------------------------------
# normalized-magnitude ops
# --------------------------------------------------------------------------

def mag_add(x, y):
    """x + y, same width (caller guarantees no overflow out the top)."""
    nw = x.shape[-1]
    carry = jnp.zeros(x.shape[:-1], U32)
    out = []
    for w in range(nw):
        yw = y[..., w]
        s = x[..., w] + yw
        c1 = (s < yw).astype(U32)
        s2 = s + carry
        c2 = (s2 < s).astype(U32)
        out.append(s2)
        carry = c1 + c2  # exclusive: at most one fires
    return jnp.stack(out, axis=-1)


def mag_sub_borrow(x, y):
    """(x - y) mod 2^(32*NW) and the final borrow flag (x < y)."""
    nw = x.shape[-1]
    borrow = jnp.zeros(x.shape[:-1], jnp.bool_)
    out = []
    for w in range(nw):
        xw, yw = x[..., w], y[..., w]
        d = xw - yw - borrow.astype(U32)
        nb = (xw < yw) | ((xw == yw) & borrow)
        out.append(d)
        borrow = nb
    return jnp.stack(out, axis=-1), borrow


def mag_sub(x, y):
    """x - y for x >= y (unchecked)."""
    return mag_sub_borrow(x, y)[0]


def mag_ge(x, y):
    """Boolean x >= y (same width)."""
    return ~mag_sub_borrow(x, y)[1]


def mag_gt(x, y):
    """Boolean x > y."""
    return mag_sub_borrow(y, x)[1]


def mag_is_zero(x):
    acc = x[..., 0]
    for w in range(1, x.shape[-1]):
        acc = acc | x[..., w]
    return acc == 0


def mag_select(pred, a, b):
    """Elementwise pred ? a : b on magnitudes; pred has batch shape."""
    return jnp.where(pred[..., None], a, b)


def mag_cond_sub(x, m_words: np.ndarray):
    """x mod-correct: subtract the static constant m once if x >= m."""
    m = jnp.asarray(_fit(m_words, x.shape[-1]))
    d, borrow = mag_sub_borrow(x, jnp.broadcast_to(m, x.shape))
    return jnp.where(borrow[..., None], x, d)


def mag_inc(x, pred):
    """x + (pred ? 1 : 0) with carry propagation."""
    nw = x.shape[-1]
    carry = pred.astype(U32)
    out = []
    for w in range(nw):
        s = x[..., w] + carry
        carry = (s < carry).astype(U32)
        out.append(s)
    return jnp.stack(out, axis=-1)


def mag_truncate(x, nw: int):
    return x[..., :nw]


def _fit(words: np.ndarray, nw: int) -> np.ndarray:
    words = np.asarray(words, np.uint32)
    if words.shape[-1] >= nw:
        if np.any(words[..., nw:]):
            raise OverflowError("static constant wider than target")
        return words[..., :nw]
    pad = [(0, 0)] * (words.ndim - 1) + [(0, nw - words.shape[-1])]
    return np.pad(words, pad)


def mag_mul_static(x, r_words: np.ndarray):
    """x[..., NWx] * static constant (uint32[NWr]) -> [..., NWx + NWr].

    Python-loop over the static words; each step is one vectorized
    widening multiply over the full x word axis plus carry-save adds.
    """
    r_words = np.asarray(r_words, np.uint32)
    nwx = x.shape[-1]
    nwr = r_words.shape[-1]
    npos = nwx + nwr
    acc = acc_zero(x.shape[:-1], npos)
    for j in range(nwr):
        rj = np.uint32(r_words[j])
        if rj == 0:
            continue
        hi, lo = u64op.mul32_wide(x, jnp.full((), rj, U32))
        acc = acc_add_u32(acc, lo, j)
        acc = acc_add_u32(acc, hi, j + 1)
    return acc_propagate(acc, npos)


def mag_mul_u64pair(x, y_hi, y_lo):
    """x[..., NW] * per-element u64 (y_hi, y_lo u32 scalars) -> [..., NW+2]."""
    nwx = x.shape[-1]
    acc = acc_zero(jnp.broadcast_shapes(x.shape[:-1], y_lo.shape),
                   nwx + 2)
    hi, lo = u64op.mul32_wide(x, y_lo[..., None])
    acc = acc_add_u32(acc, lo, 0)
    acc = acc_add_u32(acc, hi, 1)
    hi, lo = u64op.mul32_wide(x, y_hi[..., None])
    acc = acc_add_u32(acc, lo, 1)
    acc = acc_add_u32(acc, hi, 2)
    return acc_propagate(acc, nwx + 2)


# --------------------------------------------------------------------------
# Barrett division/remainder by STATIC constants
# --------------------------------------------------------------------------

class StaticDivisor:
    """Host-precomputed reciprocal plan for floor-division by a fixed D.

    For inputs num < 2^(32*fw):  R = floor(2^F / D) with F = 32*fw, then
    t = floor(num * R / 2^F) satisfies floor(num/D) - 1 <= t <= floor(num/D)
    (exactly; since num < 2^F), so one conditional correction step makes
    both the quotient and the remainder exact.
    """

    def __init__(self, d: int, max_value: int) -> None:
        if d <= 0:
            raise ValueError("divisor must be positive")
        self.d = int(d)
        bits = max(int(max_value).bit_length() + 1, 33)
        self.fw = (bits + 31) // 32
        f = 32 * self.fw
        r = (1 << f) // self.d
        self.r_words = words_from_int(r, nw_for_bits(r.bit_length()))
        self.d_words = words_from_int(self.d, nw_for_bits(self.d.bit_length()))
        self.nw_in = self.fw                      # num must fit fw words
        # quotient fits max_value/d
        self.nw_q = nw_for_bits((int(max_value) // self.d).bit_length() or 1)


def div_by_static(num, plan: StaticDivisor):
    """floor(num / D) exactly; num uint32[..., nw] with nw <= plan.nw_in
    words and value < 2^(32*plan.nw_in). Returns uint32[..., plan.nw_q]."""
    nw = num.shape[-1]
    if nw < plan.nw_in:
        pad = [(0, 0)] * (num.ndim - 1) + [(0, plan.nw_in - nw)]
        num = jnp.pad(num, pad)
    elif nw > plan.nw_in:
        raise ValueError("numerator wider than the divisor plan allows")
    prod = mag_mul_static(num, plan.r_words)
    t = prod[..., plan.fw:]
    # r = num - t*D; exact quotient iff r < D
    td = mag_mul_static(t, plan.d_words)[..., : plan.nw_in]
    r = mag_sub(num, td)
    d_full = jnp.asarray(_fit(plan.d_words, plan.nw_in))
    fix = mag_ge(r, jnp.broadcast_to(d_full, r.shape))
    t = mag_inc(t, fix)
    return t[..., : plan.nw_q]


def mod_by_static(num, plan: StaticDivisor):
    """num mod D exactly (same contract as :func:`div_by_static`).
    Returns uint32[..., nw_d] where nw_d = len(plan.d_words)."""
    nw = num.shape[-1]
    if nw < plan.nw_in:
        pad = [(0, 0)] * (num.ndim - 1) + [(0, plan.nw_in - nw)]
        num = jnp.pad(num, pad)
    elif nw > plan.nw_in:
        raise ValueError("numerator wider than the divisor plan allows")
    prod = mag_mul_static(num, plan.r_words)
    t = prod[..., plan.fw:]
    td = mag_mul_static(t, plan.d_words)[..., : plan.nw_in]
    r = mag_sub(num, td)
    r = mag_cond_sub(r, _fit(plan.d_words, plan.nw_in))
    return r[..., : plan.d_words.shape[-1]]
