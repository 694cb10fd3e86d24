"""Negacyclic NTT correctness: exact round-trips and the convolution theorem.

The NTT here is a dense twiddle-matrix multiply (see pvw_tpu/ops/ntt.py);
these tests pin down (a) forward/inverse exactness over the full residue
range, (b) that pointwise products in the forward domain equal negacyclic
convolution mod X^l + 1 computed with exact host integers, and (c) batch
shape handling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pvw_tpu.ops import u64 as u
from pvw_tpu.ops import modmat, ntt
from pvw_tpu.params.ring import RingPlan

RNG = np.random.default_rng(77)
MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)
BIG = (0x800000022A0001, 0x800000021A0001, 0x80000002120001, 0x80000001F60001)


def pairs(x):
    hi, lo = u.split_u64_np(np.asarray(x, np.uint64))
    return jnp.asarray(hi), jnp.asarray(lo)


def ints(p):
    return u.join_u64_np(np.asarray(p[0]), np.asarray(p[1]))


def rand_poly(ring, batch=()):
    qs = np.array(ring.moduli, np.uint64).reshape((1,) * len(batch) + (-1, 1))
    vals = RNG.integers(0, 1 << 62, size=batch + (ring.num_limbs, ring.degree), dtype=np.uint64)
    return (vals % qs).astype(np.uint64)


def negacyclic_mul_host(a, b, q, l):
    out = [0] * l
    for i in range(l):
        for j in range(l):
            k = i + j
            term = int(a[i]) * int(b[j])
            if k < l:
                out[k] = (out[k] + term) % q
            else:
                out[k - l] = (out[k - l] - term) % q
    return [x % q for x in out]


@pytest.mark.parametrize("moduli,l", [(MODULI, 8), (MODULI, 16), (MODULI, 32), (BIG, 8)])
def test_roundtrip(moduli, l):
    ring = RingPlan(moduli, l)
    x = rand_poly(ring, (5,))
    y = ntt.ntt_inverse(ntt.ntt_forward(pairs(x), ring), ring)
    np.testing.assert_array_equal(ints(y), x)


@pytest.mark.parametrize("moduli,l", [(MODULI, 8), (MODULI, 16), (BIG, 8)])
def test_convolution_theorem(moduli, l):
    ring = RingPlan(moduli, l)
    a = rand_poly(ring)
    b = rand_poly(ring)
    fa = ntt.ntt_forward(pairs(a), ring)
    fb = ntt.ntt_forward(pairs(b), ring)
    prod = modmat.poly_pointwise_mul(fa, fb, ring)
    got = ints(ntt.ntt_inverse(prod, ring))
    for i, q in enumerate(moduli):
        want = negacyclic_mul_host(a[i], b[i], q, l)
        assert [int(v) for v in got[i]] == want


def test_batch_shapes():
    ring = RingPlan(MODULI, 8)
    x = rand_poly(ring, (2, 3))
    y = ntt.ntt_forward(pairs(x), ring)
    assert y[0].shape == (2, 3, ring.num_limbs, ring.degree)
    z = ints(ntt.ntt_inverse(y, ring))
    np.testing.assert_array_equal(z, x)


def test_ntt_of_constant_poly():
    """NTT of a constant polynomial c is c in every slot (evaluations)."""
    ring = RingPlan(MODULI, 8)
    coeffs = np.zeros((ring.num_limbs, ring.degree), np.uint64)
    coeffs[:, 0] = [123456, 7890, 42]
    y = ints(ntt.ntt_forward(pairs(coeffs), ring))
    for i in range(ring.num_limbs):
        assert set(int(v) for v in y[i]) == {int(coeffs[i, 0])}


def test_linearity():
    ring = RingPlan(MODULI, 16)
    a, b = rand_poly(ring), rand_poly(ring)
    fa = ntt.ntt_forward(pairs(a), ring)
    fb = ntt.ntt_forward(pairs(b), ring)
    s = modmat.poly_add(pairs(a), pairs(b), ring)
    fs = ntt.ntt_forward(s, ring)
    np.testing.assert_array_equal(
        ints(fs), ints(modmat.poly_add(fa, fb, ring))
    )


class TestSignedCoefficientPath:
    """The small-coefficient NTT path (1-2 signed digits) must produce
    residues bit-identical to from_signed_coeffs + ntt_forward."""

    @pytest.mark.parametrize("moduli", [MODULI, BIG])
    @pytest.mark.parametrize("bound", [1, 127, 128, 2000, 32639])
    def test_matches_residue_path(self, moduli, bound):
        ring = RingPlan(moduli, 8)
        vals = np.concatenate([
            [-bound, bound, 0, -1, 1],
            RNG.integers(-bound, bound + 1, size=(3 * 8 - 5,)),
        ]).astype(np.int32).reshape(3, 8)
        coeffs = jnp.asarray(vals)
        want = ntt.ntt_forward(modmat.from_signed_coeffs(coeffs, ring), ring)
        got = ntt.ntt_forward_signed(coeffs, ring, bound)
        np.testing.assert_array_equal(ints(got), ints(want))

    @pytest.mark.parametrize("moduli", [MODULI, BIG])
    def test_channel_major_variant(self, moduli):
        """ntt_forward_signed_ch must equal the batch-major variant
        transposed to channel-major, for multi-dim batch shapes."""
        ring = RingPlan(moduli, 8)
        vals = RNG.integers(-127, 128, size=(3, 5, 8)).astype(np.int32)
        coeffs = jnp.asarray(vals)
        want = ntt.ntt_forward_signed(coeffs, ring, 127)   # [3, 5, L, l]
        got = ntt.ntt_forward_signed_ch(coeffs, ring, 127)  # [L, l, 3, 5]
        got_bm = tuple(jnp.transpose(g, (2, 3, 0, 1)) for g in got)
        np.testing.assert_array_equal(ints(got_bm), ints(want))

    def test_digit_count_thresholds(self):
        assert ntt.signed_digit_count(127) == 1
        assert ntt.signed_digit_count(128) == 2
        assert ntt.signed_digit_count(32639) == 2
        assert ntt.signed_digit_count(32640) == 0

    def test_cols_match_padded_fold(self):
        """Folding the narrow signed-path columns (with the bias looked up
        for the actual width) equals the full-width residue fold."""
        ring = RingPlan(MODULI, 8)
        vals = RNG.integers(-2000, 2001, size=(4, 8)).astype(np.int32)
        cols, bs = ntt.ntt_forward_cols_signed(jnp.asarray(vals), ring, 2000)
        assert cols.shape[-1] == ring.num_digits + 1  # jr=2
        oh, ol = modmat._fold_leading(cols, ring)
        want = ntt.ntt_forward(
            modmat.from_signed_coeffs(jnp.asarray(vals), ring), ring
        )
        got_h = np.moveaxis(np.asarray(oh), -1, 0).reshape(
            bs + (ring.num_limbs, ring.degree))
        got_l = np.moveaxis(np.asarray(ol), -1, 0).reshape(
            bs + (ring.num_limbs, ring.degree))
        np.testing.assert_array_equal(ints((got_h, got_l)), ints(want))
