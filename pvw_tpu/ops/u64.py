"""Exact 64-bit unsigned arithmetic in 32-bit TPU lanes.

TPUs have no native 64-bit integer path worth using (XLA emulates s64
slowly and Pallas/Mosaic has no u64 at all), so every residue of the RNS
representation lives as a pair of ``uint32`` arrays ``(hi, lo)`` with
``value = hi * 2^32 + lo``.  This module provides the exact primitives the
rest of the framework builds on:

- ``mul32_wide``       32x32 -> 64 products via 16-bit splits
- ``add64/sub64/...``  carry-propagating pair arithmetic
- ``shoup_mul_const``  w*x mod q for a host-precomputed constant w < q
                       (Harvey/Shoup: one mulhi + two mullo, no division)
- ``to_signed_digits`` residue -> eight signed 8-bit digits (balanced
                       representation, exact), feeding int8 MXU matmuls

Replaces the modular-arithmetic layer the reference delegates to
``fhe-math``'s ``zq`` module (see SURVEY.md §2.3); the design is new —
the reference does native u64 mul/mod on CPU, which has no TPU analogue.

All functions are shape-polymorphic jnp element-wise ops: they work under
``jit``, ``vmap`` and inside Pallas kernels alike.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_M8 = np.uint32(0xFF)


# --------------------------------------------------------------------------
# host <-> device conversion helpers
# --------------------------------------------------------------------------

def split_u64_np(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host numpy uint64 array -> (hi, lo) uint32 arrays."""
    x = np.asarray(x, dtype=np.uint64)
    return (x >> np.uint64(32)).astype(np.uint32), (
        x & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)


def join_u64_np(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint32 arrays -> host numpy uint64 array."""
    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64
    )


def const_pair(value: int) -> tuple[np.uint32, np.uint32]:
    """Python int < 2^64 -> (hi, lo) uint32 scalars for embedding in traces."""
    if not 0 <= value < 1 << 64:
        raise ValueError(f"{value} out of u64 range")
    return np.uint32(value >> 32), np.uint32(value & 0xFFFFFFFF)


# --------------------------------------------------------------------------
# 32-bit building blocks
# --------------------------------------------------------------------------

def mul32_wide(x, y):
    """Exact 32x32 -> 64 multiply. Returns (hi, lo) uint32.

    16-bit split schoolbook; all intermediates provably < 2^32.
    """
    x = x.astype(U32)
    y = y.astype(U32)
    x0 = x & _M16
    x1 = x >> 16
    y0 = y & _M16
    y1 = y >> 16
    ll = x0 * y0
    t1 = x1 * y0 + (ll >> 16)        # <= (2^16-1)^2 + (2^16-1) < 2^32
    t2 = x0 * y1 + (t1 & _M16)       # < 2^32
    lo = (ll & _M16) | (t2 << 16)
    hi = x1 * y1 + (t1 >> 16) + (t2 >> 16)
    return hi, lo


def mulhi32(x, y):
    """High 32 bits of the 32x32 product."""
    return mul32_wide(x, y)[0]


# --------------------------------------------------------------------------
# u64 pair arithmetic
# --------------------------------------------------------------------------

def add64(ah, al, bh, bl):
    """(a + b) mod 2^64 as a pair; carries handled exactly."""
    lo = al + bl
    carry = (lo < al).astype(U32)
    hi = ah + bh + carry
    return hi, lo


def sub64(ah, al, bh, bl):
    """(a - b) mod 2^64 as a pair."""
    lo = al - bl
    borrow = (al < bl).astype(U32)
    hi = ah - bh - borrow
    return hi, lo


def lt64(ah, al, bh, bl):
    """Boolean a < b."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def geq64(ah, al, bh, bl):
    return ~lt64(ah, al, bh, bl)


def select64(pred, ah, al, bh, bl):
    """Elementwise pred ? a : b on pairs."""
    return jnp.where(pred, ah, bh), jnp.where(pred, al, bl)


def mul64_lo(ah, al, bh, bl):
    """Low 64 bits of a*b."""
    hi, lo = mul32_wide(al, bl)
    hi = hi + al * bh + ah * bl      # wrapping uint32 adds — only low word kept
    return hi, lo


def mul64_wide(ah, al, bh, bl):
    """Full 128-bit product as four 32-bit words (w3, w2, w1, w0)."""
    h00, l00 = mul32_wide(al, bl)
    h01, l01 = mul32_wide(al, bh)
    h10, l10 = mul32_wide(ah, bl)
    h11, l11 = mul32_wide(ah, bh)
    w0 = l00
    s1 = h00 + l01
    c1 = (s1 < h00).astype(U32)
    w1 = s1 + l10
    c2 = (w1 < s1).astype(U32)
    s2 = h01 + h10
    c3 = (s2 < h01).astype(U32)
    s3 = s2 + l11
    c4 = (s3 < s2).astype(U32)
    w2 = s3 + c1 + c2
    c5 = (w2 < s3).astype(U32)
    w3 = h11 + c3 + c4 + c5
    return w3, w2, w1, w0


def mulhi64(ah, al, bh, bl):
    """High 64 bits of a*b as a pair (w3, w2)."""
    w3, w2, _, _ = mul64_wide(ah, al, bh, bl)
    return w3, w2


# --------------------------------------------------------------------------
# modular arithmetic (q < 2^62 prime, per-limb constant)
# --------------------------------------------------------------------------

def addmod(ah, al, bh, bl, qh, ql):
    """(a + b) mod q for a, b < q < 2^63 (sum never wraps 2^64)."""
    sh, sl = add64(ah, al, bh, bl)
    over = geq64(sh, sl, qh, ql)
    rh, rl = sub64(sh, sl, qh, ql)
    return select64(over, rh, rl, sh, sl)


def submod(ah, al, bh, bl, qh, ql):
    """(a - b) mod q for a, b < q."""
    under = lt64(ah, al, bh, bl)
    # a - b, or a + q - b when a < b
    sh, sl = sub64(ah, al, bh, bl)
    th, tl = add64(ah, al, qh, ql)
    th, tl = sub64(th, tl, bh, bl)
    return select64(under, th, tl, sh, sl)


def negmod(ah, al, qh, ql):
    """(-a) mod q for a < q."""
    zero = (ah == 0) & (al == 0)
    rh, rl = sub64(qh, ql, ah, al)
    return jnp.where(zero, 0, rh).astype(U32), jnp.where(zero, 0, rl).astype(U32)


def shoup_mul64_arr(x_h, x_l, wh, wl, wph, wpl, qh, ql):
    """w * x mod q with array (broadcastable) constants w < q and x < 2^64.

    Harvey's variant of Shoup multiplication:
        t = mulhi64(w', x)  with  w' = floor(w * 2^64 / q)
        r = (w*x - t*q) mod 2^64, then one conditional subtract.
    Exact for any x < 2^64 given w < q < 2^63.
    """
    th, tl = mulhi64(wph, wpl, x_h, x_l)
    wx_h, wx_l = mul64_lo(wh, wl, x_h, x_l)
    tq_h, tq_l = mul64_lo(th, tl, qh, ql)
    rh, rl = sub64(wx_h, wx_l, tq_h, tq_l)
    over = geq64(rh, rl, qh, ql)
    sh, sl = sub64(rh, rl, qh, ql)
    return select64(over, sh, sl, rh, rl)


def shoup_mul32_arr(x, wh, wl, wp32, qh, ql):
    """w * x mod q for 32-bit ``x`` and array (broadcastable) constants.

    Cheaper fold-path variant: w' = floor(w * 2^32 / q) fits in uint32, so the
    quotient estimate is a single 32x32 mulhi. Exact for x < 2^32, w < q < 2^63.
    """
    x = x.astype(U32)
    t = mulhi32(wp32, x)
    # w*x (low 64): (wh,wl) * x  with x 32-bit
    h1, l1 = mul32_wide(wl, x)
    wx_h, wx_l = h1 + wh * x, l1
    # t*q (low 64)
    h2, l2 = mul32_wide(t, ql)
    tq_h, tq_l = h2 + t * qh, l2
    rh, rl = sub64(wx_h, wx_l, tq_h, tq_l)
    over = geq64(rh, rl, qh, ql)
    sh, sl = sub64(rh, rl, qh, ql)
    return select64(over, sh, sl, rh, rl)


def shoup_mul_const(x_h, x_l, w: int, w_shoup: int, q: int):
    """Scalar-constant convenience wrapper over :func:`shoup_mul64_arr`."""
    wh, wl = const_pair(w)
    wph, wpl = const_pair(w_shoup)
    qh, ql = const_pair(q)
    return shoup_mul64_arr(x_h, x_l, wh, wl, wph, wpl, qh, ql)


def shoup_mul_const32(x, w: int, w_shoup32: int, q: int):
    """Scalar-constant convenience wrapper over :func:`shoup_mul32_arr`."""
    wh, wl = const_pair(w)
    qh, ql = const_pair(q)
    return shoup_mul32_arr(x, wh, wl, np.uint32(w_shoup32), qh, ql)


def shoup_constants(w: int, q: int) -> tuple[int, int]:
    """Host precompute: (floor(w<<64 / q), floor(w<<32 / q)) for w < q."""
    if not 0 <= w < q:
        raise ValueError("Shoup constant requires w < q")
    return (w << 64) // q, (w << 32) // q


# --------------------------------------------------------------------------
# signed 8-bit digit decomposition
# --------------------------------------------------------------------------

NUM_DIGITS = 8
NUM_COLUMNS = 2 * NUM_DIGITS - 1  # 15 convolution columns
# int8-digit contraction headroom: 8 digit pairs * 128^2 * k must fit int32.
MAX_CONTRACTION = 8192


def digits_for_max(value: int) -> int:
    """Minimal digit count nd such that :func:`to_signed_digits` is exact
    for every input <= ``value``.

    Exactness requires the final balancing carry to vanish: the top raw
    digit plus an incoming carry must stay < 128, i.e.
    ``value >> (8*(nd-1)) <= 126``. A 37-bit prime chain needs only 5
    digits (9 convolution columns) — 2.7x fewer MXU MACs than the full
    8-digit form; 55-bit and larger primes still need all 8.
    """
    value = int(value)
    if not 0 <= value < 1 << 64:
        raise ValueError(f"{value} out of u64 range")
    nd = 1
    while (value >> (8 * (nd - 1))) > 126:
        nd += 1
    return min(nd, NUM_DIGITS)


def to_signed_digits(hi, lo, nd: int = NUM_DIGITS):
    """u64 pair -> ``nd`` balanced signed digits d_i in [-128, 127].

    Exact (value = Σ d_i * 2^(8i)) whenever value >> (8*(nd-1)) <= 126 —
    see :func:`digits_for_max`; with the default nd=8 this covers all
    values < 2^62 (every RNS residue). For arbitrary u64 input at nd=8 the
    final balancing carry is dropped, so the digit sum equals the value
    interpreted as a SIGNED i64 (mod-2^64 wrap) — deliberately matching
    Rust's ``as i64`` cast semantics; the gadget encode relies on this
    (``encryption.rs:195``).

    Output shape: input shape + trailing axis of length ``nd``, dtype int8.
    The balanced form lets the digit matmuls run as int8 MXU contractions
    with int32 accumulators and no zero-point correction terms.
    """
    return jnp.stack(to_signed_digit_list(hi, lo, nd), axis=-1)


def to_signed_digit_list(hi, lo, nd: int = NUM_DIGITS) -> list:
    """:func:`to_signed_digits` as a LIST of per-digit int8 planes (each
    the input shape) instead of a stacked minor axis — callers that need
    a different digit-axis position can place the planes without a
    lane-crossing transpose of the stacked tensor."""
    words = [lo, hi]
    raw = []
    for w in words:
        w = w.astype(U32)
        for s in (0, 8, 16, 24):
            raw.append(((w >> s) & _M8).astype(jnp.int32))
    # Balance: propagate +1 carries left when a digit >= 128.
    out = []
    carry = jnp.zeros_like(raw[0])
    for i in range(nd):
        v = raw[i] + carry              # <= 256
        big = v >= 128
        out.append(jnp.where(big, v - 256, v).astype(jnp.int8))
        carry = big.astype(jnp.int32)
    # For in-range values (see digits_for_max) the top digit is <= 127
    # after the carry, so the final carry is provably zero.
    return out


def fold_columns_grouped(cols, grp_wh, grp_wl, grp_sh, grp_sl, bias_h, bias_l,
                         qh, ql):
    """Cheaper recombination of digit-convolution columns, exact.

    Let V = sum_c M_c * 2^(8c) with M_c int32. Bias each column by 2^31
    (U_c = M_c + 2^31, unsigned) so sign handling disappears; the constant
    sum K = sum_c 2^31 * 2^(8c) mod q is precomputed per limb and
    subtracted once. Group the 15 biased columns four-at-a-time into exact
    u64 accumulators (max 4 * 2^32 * 2^24 < 2^59):

        G_g = sum_{r<4} U_{4g+r} << 8r          (g = 0..3)
        V + K = G_0 + G_1*2^32 + G_2*2^64 + G_3*2^96

    then four Shoup multiplies by w_g = 2^(32g) mod q and one constant
    subtract. ~1.5x fewer VPU ops than 15 per-column Shoup folds and a
    single pass over the column data.

    ``grp_*``: broadcastable arrays indexed by the trailing axis (length 4)
    of w_g and its 64-bit Shoup companion; ``bias_*``: K mod q pairs.
    """
    shape = cols.shape[:-1]
    acc_h = jnp.zeros(shape, U32)
    acc_l = jnp.zeros(shape, U32)
    num_cols = cols.shape[-1]
    for g in range((num_cols + 3) // 4):
        gh = jnp.zeros(shape, U32)
        gl = jnp.zeros(shape, U32)
        for r in range(4):
            c = 4 * g + r
            if c >= num_cols:
                break
            uc = (cols[..., c] + jnp.int32(-0x80000000)).astype(U32)  # +2^31
            if r == 0:
                th, tl = jnp.zeros_like(uc), uc
            else:
                th, tl = uc >> (32 - 8 * r), uc << (8 * r)
            gh, gl = add64(gh, gl, th, tl)
        th, tl = shoup_mul64_arr(
            gh, gl,
            grp_wh[..., g], grp_wl[..., g], grp_sh[..., g], grp_sl[..., g],
            qh, ql,
        )
        acc_h, acc_l = addmod(acc_h, acc_l, th, tl, qh, ql)
    return submod(acc_h, acc_l, bias_h, bias_l, qh, ql)


def fold_columns_words(cols, wrd_wh, wrd_wl, wrd_wp32, bias_h, bias_l,
                       qh, ql):
    """Word-regrouped column fold — same exact result as
    :func:`fold_columns_grouped`, fewer VPU ops.

    Build the biased group accumulators G_g exactly as the grouped fold
    does, but instead of one 64-bit Shoup multiply per group, regroup
    their 32-bit halves by weight: V + K = sum_g G_g * 2^(32g) with
    G_g = gh_g*2^32 + gl_g, so

        V + K = sum_w W_w * 2^(32w),   W_0 = gl_0,
        W_w = gh_(w-1) + gl_w + carry_(w-1)   (exact u32 adds w/ carries)

    Each W_w < 2^32, so words 1.. reduce with ONE 32-bit Shoup multiply
    (:func:`shoup_mul32_arr`, ~half the ops of the 64-bit form) and W_0
    adds in directly. REQUIRES q > 2^32 per limb (W_0 < q and the
    shoup32 precondition); callers must guard with ``ring.fold_words_ok``.

    ``wrd_*``: broadcastable arrays indexed by the trailing axis (length
    ngroups) of 2^(32w) mod q for w = 1..ngroups and its 32-bit Shoup
    companion; ``bias_*``: K mod q pairs.
    """
    shape = cols.shape[:-1]
    num_cols = cols.shape[-1]
    ng = (num_cols + 3) // 4
    ghs, gls = [], []
    for g in range(ng):
        gh = jnp.zeros(shape, U32)
        gl = jnp.zeros(shape, U32)
        for r in range(4):
            c = 4 * g + r
            if c >= num_cols:
                break
            uc = (cols[..., c] + jnp.int32(-0x80000000)).astype(U32)  # +2^31
            if r == 0:
                th, tl = jnp.zeros_like(uc), uc
            else:
                th, tl = uc >> (32 - 8 * r), uc << (8 * r)
            gh, gl = add64(gh, gl, th, tl)
        ghs.append(gh)
        gls.append(gl)
    # word stream: acc starts at W_0 = gl_0 (< 2^32 < q)
    acc_h = jnp.zeros(shape, U32)
    acc_l = gls[0]
    carry = None
    for w in range(1, ng + 1):
        if w == ng and num_cols % 4 == 1 and carry is not None:
            # the last group held a single column (r = 0), so gh_(ng-1) is
            # provably zero and the top word is just the carry bit: one
            # conditional addmod of 2^(32*ng) mod q instead of a Shoup.
            th = jnp.where(carry > 0, wrd_wh[..., w - 1], 0).astype(U32)
            tl = jnp.where(carry > 0, wrd_wl[..., w - 1], 0).astype(U32)
            acc_h, acc_l = addmod(acc_h, acc_l, th, tl, qh, ql)
            break
        s1 = ghs[w - 1] + (gls[w] if w < ng else jnp.zeros(shape, U32))
        c1 = (s1 < ghs[w - 1]).astype(U32)
        if carry is not None:
            s2 = s1 + carry
            c1 = c1 + (s2 < s1).astype(U32)  # the two carries are exclusive
            s1 = s2
        carry = c1
        th, tl = shoup_mul32_arr(
            s1, wrd_wh[..., w - 1], wrd_wl[..., w - 1], wrd_wp32[..., w - 1],
            qh, ql,
        )
        acc_h, acc_l = addmod(acc_h, acc_l, th, tl, qh, ql)
    # no carry can leave the top word: its raw sum gh_(ng-1) + carry_in is
    # far below 2^32 (gh_g <= 2^24 + 1 by the G_g bound in DESIGN.md §5).
    return submod(acc_h, acc_l, bias_h, bias_l, qh, ql)


def fold_columns(cols, pow_wh, pow_wl, pow_wp32, qh, ql):
    """Recombine digit-convolution columns into a residue mod q.

    ``cols``: int32 array [..., 15] of column sums M_c with |M_c| < 2^31
    (the digit-matmul output). ``pow_*``: broadcastable arrays of the 15
    constants 2^(8c) mod q and their Shoup companions, indexed by the last
    axis (length 15); q as broadcastable (qh, ql). Returns a pair < q.
    """
    shape = jnp.broadcast_shapes(cols.shape[:-1], qh.shape if hasattr(qh, "shape") else ())
    acc_h = jnp.zeros(shape, U32)
    acc_l = jnp.zeros(shape, U32)
    for c in range(cols.shape[-1]):
        m = cols[..., c]
        neg = m < 0
        mag = jnp.where(neg, -m, m).astype(U32)
        th, tl = shoup_mul32_arr(
            mag, pow_wh[..., c], pow_wl[..., c], pow_wp32[..., c], qh, ql
        )
        th, tl = select64(neg, *negmod(th, tl, qh, ql), th, tl)
        acc_h, acc_l = addmod(acc_h, acc_l, th, tl, qh, ql)
    return acc_h, acc_l
