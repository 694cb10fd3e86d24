"""Differential tests: on-device decode vs the exact Python oracle.

The device decode (pvw_tpu/crypto/device_decode.py) must be bit-identical
to ``decode_scalar_pvw_rns`` — the line-by-line transcription of the
reference's ``decryption.rs:10-58`` — on every parameter family, including
the 17-limb/1037-bit chain and multiword-Δ sets the C++ engine refuses.
"""

import numpy as np
import pytest

from pvw_tpu.crypto import device_decode as dd
from pvw_tpu.crypto.decryption import decode_scalar_pvw_rns
from pvw_tpu.ops import mw, u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder
from pvw_tpu.utils.intmath import generate_ntt_primes


def _params(moduli, l, n=4, k=32):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    return (
        PvwParametersBuilder()
        .set_parties(n).set_dimension(k).set_l(l).set_moduli(moduli)
        .set_secret_variance(0.5).set_error_bounds_u32(b1, b2)
        .build()
    )


def _adversarial_rows(params, d):
    """Residue matrices hitting every decode boundary: centering at q/2,
    the ±1000 noise clamp, Δ multiples (rounding-division edges), the
    Δ^(l-1) remainder wrap, and the 2^64 output-fit check."""
    q = params.q_total()
    delta = params.delta()
    dpow = params.delta_power_l_minus_1()
    specials = [
        0, 1, 2, q - 1, q - 2, q // 2, q // 2 + 1, q // 2 - 1,
        500, 999, 1000, 1001, q - 500, q - 999, q - 1000, q - 1001,
        delta, delta - 1, delta + 1, 2 * delta, q - delta, q - 2 * delta,
        dpow % q, (dpow // 2) % q, (dpow // 2 + 1) % q, (q - dpow) % q,
        (1 << 64) - 1, (1 << 64) % q, ((1 << 64) + 12345) % q,
        (delta // 2) % q, (3 * delta // 2) % q, (q - delta // 2) % q,
    ]
    L, l = params.ring.num_limbs, params.l
    rng = np.random.default_rng(7)
    res = np.zeros((d, L, l), np.uint64)
    for i, m in enumerate(params.ring.moduli):
        res[:, i, :] = rng.integers(0, m, size=(d, l), dtype=np.uint64)
    row = 0
    for v in specials:
        if row >= d:
            break
        for j in range(l):
            for i, m in enumerate(params.ring.moduli):
                res[row, i, j] = (v * (j + 1) + j) % m
        row += 1
    return res


def _check(params, d=48):
    plan = dd.get_plan(params)
    assert plan.supported
    res = _adversarial_rows(params, d)
    rh, rl = u64op.split_u64_np(res)
    out = np.asarray(dd.decode_residues_jit(plan, rh, rl))
    got = (out[0].astype(np.uint64) << np.uint64(32)) | out[1].astype(
        np.uint64)
    for i in range(d):
        want = decode_scalar_pvw_rns(res[i], params)
        assert int(got[i]) == want, f"row {i}: {int(got[i])} != {want}"


def test_headline_2limb_l8():
    _check(_params((0xFFFFC4001, 0x1FFFFE0001), 8), d=64)


def test_reference_3limb_l16():
    # the reference's test chain (tests/params.rs:21)
    _check(_params((0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001), 16))


def test_55bit_4limb_l8():
    _check(_params(tuple(generate_ntt_primes(55, 4, 8)), 8))


def test_single_small_limb_l32():
    _check(_params((0xFFFFC4001,), 32))


@pytest.mark.slow
def test_61bit_17limb_l32():
    # 1037-bit q at l=32 (delta ~ 2^32, at the u64 edge)
    _check(_params(tuple(generate_ntt_primes(61, 17, 32)), 32, k=16), d=16)


@pytest.mark.slow
def test_multiword_delta_17limb_l8():
    # delta ~ 2^129: beyond the native C++ engine's u64-delta limit —
    # only the Python oracle and the device path cover this family.
    params = _params(tuple(generate_ntt_primes(61, 17, 8)), 8, k=16)
    assert params.delta() >= (1 << 63)
    _check(params, d=12)


# ---------------------------------------------------------------------------
# multiword primitive unit tests (pvw_tpu/ops/mw.py) vs Python ints
# ---------------------------------------------------------------------------

def test_mw_mul_static_and_divmod():
    rng = np.random.default_rng(3)
    for bits in (40, 96, 200, 1050):
        nw = mw.nw_for_bits(bits)
        xs = [int.from_bytes(rng.bytes((bits + 7) // 8), "little") % (1 << bits)
              for _ in range(16)]
        x_words = np.stack([mw.words_from_int(x, nw) for x in xs])
        c = int.from_bytes(rng.bytes((bits + 7) // 8), "little") % (1 << bits) or 1
        c_words = mw.words_from_int(c, nw)
        prod = np.asarray(mw.mag_mul_static(x_words, c_words))
        for i, x in enumerate(xs):
            assert mw.int_from_words(prod[i]) == x * c

        d = (int.from_bytes(rng.bytes((bits // 2 + 7) // 8), "little")
             % (1 << (bits // 2))) or 3
        plan = mw.StaticDivisor(d, (1 << bits) - 1)
        quot = np.asarray(mw.div_by_static(x_words, plan))
        rem = np.asarray(mw.mod_by_static(x_words, plan))
        for i, x in enumerate(xs):
            assert mw.int_from_words(quot[i]) == x // d
            assert mw.int_from_words(rem[i]) == x % d


def test_mw_add_sub_cmp():
    rng = np.random.default_rng(4)
    bits = 130
    nw = mw.nw_for_bits(bits + 1)
    xs = [int.from_bytes(rng.bytes(17), "little") % (1 << bits) for _ in range(32)]
    ys = [int.from_bytes(rng.bytes(17), "little") % (1 << bits) for _ in range(32)]
    xw = np.stack([mw.words_from_int(v, nw) for v in xs])
    yw = np.stack([mw.words_from_int(v, nw) for v in ys])
    s = np.asarray(mw.mag_add(xw, yw))
    ge = np.asarray(mw.mag_ge(xw, yw))
    gt = np.asarray(mw.mag_gt(xw, yw))
    for i in range(32):
        assert mw.int_from_words(s[i]) == xs[i] + ys[i]
        assert bool(ge[i]) == (xs[i] >= ys[i])
        assert bool(gt[i]) == (xs[i] > ys[i])
    big = np.where(ge[:, None], xw, yw)
    small = np.where(ge[:, None], yw, xw)
    d = np.asarray(mw.mag_sub(big, small))
    for i in range(32):
        assert mw.int_from_words(d[i]) == abs(xs[i] - ys[i])
