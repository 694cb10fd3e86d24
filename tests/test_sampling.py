"""Sampling suite — mirror of ``/root/reference/tests/sampling.rs``:
statistical properties of CBD, bounded uniform, and the Gaussian module."""

import math

import numpy as np
import jax
import pytest

from pvw_tpu.errors import SamplingError
from pvw_tpu.params.ring import RingPlan
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.sampling import (
    box_muller,
    sample_bigint_normal_vec,
    sample_bounded_u64,
    sample_discrete_gaussian_vec,
    sample_uniform_residues,
    sample_vec_cbd,
)

MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


class TestCbd:
    def test_ternary_support_and_moments(self):
        """tests/sampling.rs:198-274: mean ~0, variance ~0.5 within ±0.1."""
        x = np.asarray(sample_vec_cbd(jax.random.key(0), (10000,), 0.5))
        assert set(np.unique(x).tolist()) <= {-1, 0, 1}
        assert abs(x.mean()) < 0.05
        assert abs(x.var() - 0.5) < 0.1

    @pytest.mark.parametrize("var", [1, 2, 5, 10, 16])
    def test_integer_variance_moments(self, var):
        x = np.asarray(sample_vec_cbd(jax.random.key(var), (20000,), float(var)))
        assert abs(x.mean()) < 4 * math.sqrt(var / 20000) * 2 + 0.05
        assert abs(x.var() - var) / var < 0.15
        assert np.abs(x).max() <= 2 * var

    def test_invalid_variance(self):
        """uniform.rs:32-34 error string."""
        with pytest.raises(SamplingError, match="between 0.5 and 16"):
            sample_vec_cbd(jax.random.key(0), (10,), 0.3)
        with pytest.raises(SamplingError, match="between 0.5 and 16"):
            sample_vec_cbd(jax.random.key(0), (10,), 17.0)

    def test_deterministic(self):
        a = np.asarray(sample_vec_cbd(jax.random.key(3), (100,), 0.5))
        b = np.asarray(sample_vec_cbd(jax.random.key(3), (100,), 0.5))
        assert np.array_equal(a, b)


class TestBoundedUniform:
    def test_range_and_mean(self):
        """tests/sampling.rs:181-195 bounds respected; sign balance."""
        vh, vl = sample_bounded_u64(jax.random.key(0), (20000,), 201)
        v = u64op.join_u64_np(np.asarray(vh), np.asarray(vl))
        assert v.max() <= 200
        assert abs(v.astype(np.float64).mean() - 100.0) < 3.0

    def test_residue_embedding(self):
        ring = RingPlan(MODULI, 8)
        bound = 100
        hi, lo = sample_uniform_residues(jax.random.key(1), (500, 8), bound, ring)
        res = u64op.join_u64_np(np.asarray(hi), np.asarray(lo))
        assert res.shape == (500, 3, 8)
        q0 = MODULI[0]
        centered = np.where(res[:, 0] > q0 // 2,
                            res[:, 0].astype(np.int64) - q0, res[:, 0])
        assert np.abs(centered).max() <= bound
        assert abs(centered.mean()) < 5
        # limbs encode the SAME value
        q1 = MODULI[1]
        centered1 = np.where(res[:, 1] > q1 // 2,
                             res[:, 1].astype(np.int64) - q1, res[:, 1])
        np.testing.assert_array_equal(centered, centered1)

    def test_sign_balance(self):
        """tests/sampling.rs:160-178."""
        ring = RingPlan(MODULI, 8)
        hi, lo = sample_uniform_residues(jax.random.key(2), (2000, 8), 50, ring)
        res = u64op.join_u64_np(np.asarray(hi), np.asarray(lo))[:, 0]
        q0 = MODULI[0]
        centered = np.where(res > q0 // 2, res.astype(np.int64) - q0, res)
        pos = (centered > 0).sum()
        neg = (centered < 0).sum()
        assert 0.8 < pos / neg < 1.25


class TestGaussian:
    def test_box_muller_moments(self):
        """tests/sampling.rs:114-129."""
        rng = np.random.default_rng(0)
        xs = [box_muller(rng) for _ in range(5000)]
        assert abs(np.mean(xs)) < 0.1
        assert abs(np.var(xs) - 1.0) < 0.15

    def test_discrete_gaussian_bounds(self):
        rng = np.random.default_rng(1)
        bound = 1000
        xs = sample_discrete_gaussian_vec(bound, 2000, rng)
        assert max(abs(x) for x in xs) <= bound
        # QUIRK preserved from the reference (normal.rs:151,169): the
        # ABSOLUTE sigma (bound/16.96 ~ 59) is compared against the
        # ratio-space threshold 0.3, so for any bound > ~5 the sampler
        # silently degrades to UNIFORM in [-bound, bound]. Uniform std is
        # bound/sqrt(3) ~ 577.
        assert abs(np.std(xs) - bound / np.sqrt(3)) < 60

    def test_small_bound_is_actually_gaussian(self):
        """Counterpart: with bound <= ~5 the sigma check passes and the
        output is genuinely concentrated (sigma = bound/16.96 < 0.3)."""
        rng = np.random.default_rng(4)
        xs = sample_discrete_gaussian_vec(5, 2000, rng)
        # sigma ~ 0.29 passes the guard; value std ~ bound*0.29 ~ 1.45,
        # clearly tighter than the uniform bound/sqrt(3) ~ 2.89
        assert np.std(xs) < 2.1

    def test_huge_variance_no_panic(self):
        """tests/sampling.rs:104-111."""
        rng = np.random.default_rng(2)
        xs = sample_bigint_normal_vec(2**100, 50, rng)
        assert len(xs) == 50
        assert any(x != 0 for x in xs)

    def test_zero_variance(self):
        assert sample_bigint_normal_vec(0, 5) == [0, 0, 0, 0, 0]

    def test_large_bound_shortcut(self):
        """normal.rs:143-149: bounds > 1e15 use the uniform shortcut."""
        rng = np.random.default_rng(3)
        xs = sample_discrete_gaussian_vec(10**16, 100, rng)
        assert max(abs(x) for x in xs) <= 1000000
