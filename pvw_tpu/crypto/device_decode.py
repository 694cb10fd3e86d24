"""On-device PVW sequential-rounding decode (SURVEY.md §7 hard part #3).

Round 1 ran the decode (``decryption.rs:10-58``) on the host, which capped
end-to-end decryption at ~44k msg/s while the device inner-product stage
ran at 1.13M msg/s (BASELINE.md). This module moves the exact
multiprecision decode onto the TPU, batched over messages, so decryption
is ONE device program and the only host fetch is the 8-byte message per
ciphertext.

Design (not a port of the reference's poly-op scaffolding — see quirk
SURVEY.md §2.4.4):

* The ``tmp[i] = z[i]·Δ − z[i+1]`` chain and the Horner fold
  (``decryption.rs:19-33``) run **in RNS**: every step is mod q, and the
  needed residues mod each q_j are exactly the PowerBasis residues the
  inner-product kernel already produced (zc[i] ≡ res[i,j] mod q_j). One
  Shoup multiply by the static constant Δ mod q_j per limb per step.
* CRT lifts to full centered integers happen only where the algorithm
  genuinely compares or divides: zc[0], the Horner result, and the l−1
  backward numerators — l+1 lifts per message, each a carry-save
  accumulation of qhat_i·t_i vectorized over limbs AND words
  (:mod:`pvw_tpu.ops.mw`).
* Every division is by a static parameter constant (Δ^(l−1) for the
  centered remainder, 2Δ for the sign-split rounding division,
  ``decryption.rs:154-207``), so quotients come from Barrett
  multiplication by host-precomputed reciprocals — exact with one
  conditional correction, no integer division on device.

Conventions preserved EXACTLY (differential-tested against
``decode_scalar_pvw_rns``, the Python transcription oracle):
strict > q/2 centering, truncated sign-split rounding division,
half-mod centering after the Δ^(l−1) remainder, and the final noise
clamp (|v| ≤ 1000 → 0, ≥ 2^64 → 0) of ``decryption.rs:226-247``.

Unlike the C++ engine (``native/pvw_decode.cpp``, delta < 2^63 only),
this path supports multiword Δ, covering EVERY valid parameter set.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import mw, u64 as u64op

U32 = jnp.uint32


# --------------------------------------------------------------------------
# host-precomputed plan
# --------------------------------------------------------------------------

class DecodePlan:
    """Static tables for one parameter set. Built once per params (host)."""

    def __init__(self, moduli: tuple[int, ...], ell: int, delta: int) -> None:
        from ..utils.intmath import CrtBasis

        self.moduli = moduli
        self.ell = ell
        self.L = len(moduli)
        crt = CrtBasis(moduli)
        q = crt.q
        self.q = q
        qbits = q.bit_length()
        self.delta = int(delta)
        dpow = pow(self.delta, ell - 1)
        self.dpow_mod_q = dpow % q
        # Magnitude width: holds L*q (lift accumulator), q + Δ (division
        # numerators) and the 64-bit output words.
        self.W = max(3, mw.nw_for_bits(qbits + 8))
        self.NWq = mw.nw_for_bits(qbits)

        # supported? (see decode_supported) — delta >= 2 guarantees
        # dpow = Δ^(l-1) <= q/Δ <= q/2, so the centered remainder modulus
        # is positive and the backward quotients stay below q/2.
        self.supported = self.delta >= 2 and 0 < self.dpow_mod_q <= q // 2

        self.q_words = mw.words_from_int(q, self.W)
        self.half_q_words = mw.words_from_int(q // 2, self.W)

        # per-limb u64 constant pairs for the RNS stages
        q_arr = np.array(moduli, np.uint64)
        self.qj_hi, self.qj_lo = u64op.split_u64_np(q_arr)          # [L]
        qinv = np.array(crt.qhat_inv, np.uint64)
        self.qinv_hi, self.qinv_lo = u64op.split_u64_np(qinv)
        qinv_sh = np.array(
            [(int(w) << 64) // m & 0xFFFFFFFFFFFFFFFF
             for w, m in zip(crt.qhat_inv, moduli)], np.uint64)
        self.qinv_sh_hi, self.qinv_sh_lo = u64op.split_u64_np(qinv_sh)
        dmod = np.array([self.delta % m for m in moduli], np.uint64)
        self.d_hi, self.d_lo = u64op.split_u64_np(dmod)
        d_sh = np.array(
            [(int(w) << 64) // m & 0xFFFFFFFFFFFFFFFF
             for w, m in zip(dmod.tolist(), moduli)], np.uint64)
        self.d_sh_hi, self.d_sh_lo = u64op.split_u64_np(d_sh)

        # qhat words for the lift
        self.qhat_words = np.stack(
            [mw.words_from_int(h, self.NWq) for h in crt.qhat])     # [L, NWq]
        # lift reduction: acc < L*q; conditionally subtract 2^j * q
        nsub = max(1, (self.L - 1).bit_length()) if self.L > 1 else 0
        self.lift_subs = [mw.words_from_int((q << j), self.W)
                          for j in reversed(range(nsub))]
        if self.L == 1:
            self.lift_subs = [mw.words_from_int(q, self.W)]

        # words -> RNS tables: 2^(32w) mod q_j with 32-bit Shoup companions
        p32 = np.zeros((self.L, self.W), np.uint64)
        p32s = np.zeros((self.L, self.W), np.uint32)
        for j, m in enumerate(moduli):
            for w in range(self.W):
                v = pow(2, 32 * w, m)
                p32[j, w] = v
                p32s[j, w] = (v << 32) // m
        self.p32_hi, self.p32_lo = u64op.split_u64_np(p32)          # [L, W]
        self.p32_wp = p32s

        if self.supported:
            # centered remainder mod m = Δ^(l-1)  (|a| <= q/2)
            self.mod_dpow = mw.StaticDivisor(dpow, q // 2)
            self.half_m_words = mw.words_from_int(
                dpow // 2, self.mod_dpow.d_words.shape[-1])
            self.m_words = self.mod_dpow.d_words
            # rounding division by 2Δ (numerator 2|a| + Δ <= q + Δ)
            self.div2d = mw.StaticDivisor(2 * self.delta, q + self.delta)
            self.delta_words_div = mw.words_from_int(
                self.delta, self.div2d.nw_in)

    def __hash__(self):
        return hash((self.moduli, self.ell, self.delta))

    def __eq__(self, other):
        return (isinstance(other, DecodePlan)
                and other.moduli == self.moduli and other.ell == self.ell
                and other.delta == self.delta)


@lru_cache(maxsize=32)
def _plan(moduli: tuple[int, ...], ell: int, delta_key: tuple) -> DecodePlan:
    # delta is a potentially huge int; key it directly (ints hash fine)
    return DecodePlan(moduli, ell, delta_key)


def get_plan(params) -> DecodePlan:
    return _plan(params.ring.moduli, params.l, params.delta())


def decode_supported(params) -> bool:
    """True when the device decode covers this parameter set (Δ ≥ 2 —
    every practically valid PVW parameter set qualifies)."""
    return get_plan(params).supported


# --------------------------------------------------------------------------
# kernel building blocks (all vectorized over the message batch d)
# --------------------------------------------------------------------------

def _sum16(x):
    """Exact sum over the limb axis (-2) of uint32 contributions, as 16-bit
    half sums (each < 2^31 for L <= 2^15)."""
    x = x.astype(U32)
    lo = jnp.sum(x & np.uint32(0xFFFF), axis=-2)
    hi = jnp.sum(x >> 16, axis=-2)
    return lo, hi


def _lift(plan: DecodePlan, rh, rl):
    """CRT lift of residues (rh, rl) [d, L] -> canonical magnitude
    [d, W] in [0, q)."""
    t_h, t_l = u64op.shoup_mul64_arr(
        rh, rl,
        jnp.asarray(plan.qinv_hi), jnp.asarray(plan.qinv_lo),
        jnp.asarray(plan.qinv_sh_hi), jnp.asarray(plan.qinv_sh_lo),
        jnp.asarray(plan.qj_hi), jnp.asarray(plan.qj_lo),
    )                                                   # [d, L], t < q_j
    qhat = jnp.asarray(plan.qhat_words)[None]           # [1, L, NWq]
    hi1, lo1 = u64op.mul32_wide(qhat, t_l[..., None])
    hi2, lo2 = u64op.mul32_wide(qhat, t_h[..., None])
    npos = plan.NWq + 2
    acc = mw.acc_zero(rh.shape[:-1], npos)
    acc = mw.acc_add_sum32(acc, *_sum16(lo1), 0)
    acc = mw.acc_add_sum32(acc, *_sum16(hi1), 1)
    acc = mw.acc_add_sum32(acc, *_sum16(lo2), 1)
    acc = mw.acc_add_sum32(acc, *_sum16(hi2), 2)
    x = mw.acc_propagate(acc, plan.W)
    for sub in plan.lift_subs:
        x = mw.mag_cond_sub(x, sub)
    return x


def _center(plan: DecodePlan, x):
    """Canonical [0, q) magnitude -> (|a|, neg) with the reference's
    STRICT > q/2 rule (``decryption.rs:140-152``)."""
    half = jnp.broadcast_to(jnp.asarray(plan.half_q_words), x.shape)
    neg = mw.mag_gt(x, half)
    qw = jnp.broadcast_to(jnp.asarray(plan.q_words), x.shape)
    return mw.mag_select(neg, mw.mag_sub(qw, x), x), neg


def _words_to_rns(plan: DecodePlan, mag, neg):
    """Sign-magnitude multiword -> canonical residues mod each q_j.
    mag [d, NWt], neg [d] -> (hi, lo) [d, L]."""
    d_shape = mag.shape[:-1] + (plan.L,)
    acc_h = jnp.zeros(d_shape, U32)
    acc_l = jnp.zeros(d_shape, U32)
    qh = jnp.asarray(plan.qj_hi)
    ql = jnp.asarray(plan.qj_lo)
    for w in range(mag.shape[-1]):
        th, tl = u64op.shoup_mul32_arr(
            mag[..., w, None],                      # [d, 1] -> broadcast L
            jnp.asarray(plan.p32_hi[:, w]), jnp.asarray(plan.p32_lo[:, w]),
            jnp.asarray(plan.p32_wp[:, w]), qh, ql,
        )
        acc_h, acc_l = u64op.addmod(acc_h, acc_l, th, tl, qh, ql)
    nh, nl = u64op.negmod(acc_h, acc_l, qh, ql)
    return u64op.select64(neg[..., None], nh, nl, acc_h, acc_l)


def _fit(x, nw: int):
    have = x.shape[-1]
    if have == nw:
        return x
    if have < nw:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nw - have)]
        return jnp.pad(x, pad)
    return x[..., :nw]


def _signed_add_mags(xm, xn, ym, yn):
    """Sign-magnitude add: (xm, xn) + (ym, yn) -> (mag, neg)."""
    same = xn == yn
    s_add = mw.mag_add(xm, ym)
    ge = mw.mag_ge(xm, ym)
    d1 = mw.mag_sub(xm, ym)
    d2 = mw.mag_sub(ym, xm)
    s_diff = mw.mag_select(ge, d1, d2)
    mag = mw.mag_select(same, s_add, s_diff)
    neg = jnp.where(same, xn, jnp.where(ge, xn, yn))
    neg = neg & ~mw.mag_is_zero(mag)
    return mag, neg


# --------------------------------------------------------------------------
# the decode
# --------------------------------------------------------------------------

def decode_residues(plan: DecodePlan, res_hi, res_lo):
    """Decode PowerBasis residues [d, L, l] (uint32 hi/lo) into u64
    messages, returned as stacked uint32 [2, d] (hi, lo).

    Exact transcription of ``decode_scalar_pvw_rns`` (decryption.py /
    ``decryption.rs:10-58``) batched over d.
    """
    ell = plan.ell
    qh = jnp.asarray(plan.qj_hi)
    ql = jnp.asarray(plan.qj_lo)
    dh, dl = jnp.asarray(plan.d_hi), jnp.asarray(plan.d_lo)
    dsh, dsl = jnp.asarray(plan.d_sh_hi), jnp.asarray(plan.d_sh_lo)

    def mul_delta(xh, xl):
        return u64op.shoup_mul64_arr(xh, xl, dh, dl, dsh, dsl, qh, ql)

    # tmp[i] = zc[i]*Δ - zc[i+1] mod q, in RNS        decryption.rs:19-27
    # (vectorized over all l-1 positions at once; constants gain a
    # trailing axis to broadcast over the position axis)
    ph, pl = u64op.shoup_mul64_arr(
        res_hi[..., :-1], res_lo[..., :-1],
        dh[:, None], dl[:, None], dsh[:, None], dsl[:, None],
        qh[:, None], ql[:, None])
    tmp_h, tmp_l = u64op.submod(ph, pl, res_hi[..., 1:], res_lo[..., 1:],
                                qh[:, None], ql[:, None])      # [d, L, l-1]

    # Horner fold mod q, in RNS                        decryption.rs:30-33
    lh, ll = tmp_h[..., 0], tmp_l[..., 0]
    if ell > 2:
        def horner_body(carry, x):
            ch, cl = carry
            xh_i, xl_i = x
            ph, pl = mul_delta(ch, cl)
            return u64op.addmod(ph, pl, xh_i, xl_i, qh, ql), None

        xs = (jnp.moveaxis(tmp_h[..., 1:], -1, 0),
              jnp.moveaxis(tmp_l[..., 1:], -1, 0))     # [l-2, d, L]
        (lh, ll), _ = jax.lax.scan(horner_body, (lh, ll), xs)

    # centered remainder mod Δ^(l-1)                   decryption.rs:36-38
    a_mag, a_neg = _center(plan, _lift(plan, lh, ll))
    red = mw.mod_by_static(_fit(a_mag, plan.mod_dpow.nw_in), plan.mod_dpow)
    half_m = jnp.broadcast_to(
        jnp.asarray(mw._fit(plan.half_m_words, red.shape[-1])), red.shape)
    m_full = jnp.broadcast_to(
        jnp.asarray(mw._fit(plan.m_words, red.shape[-1])), red.shape)
    flip = mw.mag_gt(red, half_m)
    red_mag = mw.mag_select(flip, mw.mag_sub(m_full, red), red)
    red_neg = jnp.where(flip, ~a_neg, a_neg) & ~mw.mag_is_zero(red_mag)
    noise = _words_to_rns(plan, red_mag, red_neg)      # noise[l-1] mod q

    # backward substitution                            decryption.rs:41-47
    # reverse scan over i = ell-2 .. 0; the carry holds noise[i+1] in RNS
    # plus the latest quotient (only the i=0 one survives the loop).
    delta_div = jnp.asarray(plan.delta_words_div)

    def backward_body(carry, x):
        noise_h, noise_l, _qm, _qn = carry
        txh, txl = x
        nh, nl = u64op.submod(noise_h, noise_l, txh, txl, qh, ql)
        an_mag, an_neg = _center(plan, _lift(plan, nh, nl))
        # (2|a| + Δ) / (2Δ), truncated — sign follows a
        twice = mw.mag_add(an_mag, an_mag)
        tfit = _fit(twice, plan.div2d.nw_in)
        numr = mw.mag_add(tfit, jnp.broadcast_to(delta_div, tfit.shape))
        quot_mag = mw.div_by_static(numr, plan.div2d)
        quot_neg = an_neg & ~mw.mag_is_zero(quot_mag)
        nxt_h, nxt_l = _words_to_rns(plan, quot_mag, quot_neg)
        return (nxt_h, nxt_l, quot_mag, quot_neg), None

    q0 = jnp.zeros(res_hi.shape[:-2] + (plan.div2d.nw_q,), U32)
    n0 = jnp.zeros(res_hi.shape[:-2], jnp.bool_)
    xs_b = (jnp.moveaxis(tmp_h, -1, 0), jnp.moveaxis(tmp_l, -1, 0))
    (_, _, quot_mag, quot_neg), _ = jax.lax.scan(
        backward_body, (noise[0], noise[1], q0, n0), xs_b, reverse=True)

    # plaintext = -(zc[0] + noise[0]) mod q, centered, clamped
    zc0_mag, zc0_neg = _center(plan, _lift(plan, res_hi[..., 0],
                                           res_lo[..., 0]))
    s_mag, s_neg = _signed_add_mags(
        zc0_mag, zc0_neg, _fit(quot_mag, plan.W), quot_neg)
    qw = jnp.broadcast_to(jnp.asarray(plan.q_words), s_mag.shape)
    is_zero = mw.mag_is_zero(s_mag)
    val = mw.mag_select(s_neg | is_zero, s_mag, mw.mag_sub(qw, s_mag))

    # mf = center(val); clamp per decryption.rs:226-247. Note that when
    # mf < 0 the wrapped positive value (mf + q) mod q is val itself, and
    # when mf >= 0 it IS val — so the result is always val's low 64 bits,
    # zeroed for small negatives and for values that overflow u64.
    half = jnp.broadcast_to(jnp.asarray(plan.half_q_words), val.shape)
    neg_mf = mw.mag_gt(val, half)
    mf_mag = mw.mag_select(neg_mf, mw.mag_sub(qw, val), val)
    high_zero = mf_mag[..., 1]
    for w in range(2, plan.W):
        high_zero = high_zero | mf_mag[..., w]
    small_neg = neg_mf & (high_zero == 0) & (mf_mag[..., 0] <= 1000)
    fits = val[..., 2]
    for w in range(3, plan.W):
        fits = fits | val[..., w]
    zero_out = small_neg | (fits != 0)
    out_lo = jnp.where(zero_out, 0, val[..., 0]).astype(U32)
    out_hi = jnp.where(zero_out, 0, val[..., 1]).astype(U32)
    return jnp.stack([out_hi, out_lo])


@partial(jax.jit, static_argnums=(0,))
def decode_residues_jit(plan: DecodePlan, res_hi, res_lo):
    return decode_residues(plan, res_hi, res_lo)
