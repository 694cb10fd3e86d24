"""Parameter/CRS suite — mirror of ``/root/reference/tests/params.rs``
plus golden vectors pinning this library's deterministic streams.
"""

import numpy as np
import jax
import pytest

from pvw_tpu import PvwCrs, PvwParameters, PvwParametersBuilder
from pvw_tpu.errors import InvalidParameters, PvwError
from pvw_tpu.poly import Poly, Representation
from pvw_tpu.utils.chacha import ChaCha8Rng, chacha_blocks
from pvw_tpu.utils.siphash import siphash13, tag_seed

MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


def make_params(n=3, k=4, l=8, moduli=MODULI, var=0.5):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, var)
    return (
        PvwParametersBuilder()
        .set_parties(n).set_dimension(k).set_l(l)
        .set_moduli(moduli).set_secret_variance(var)
        .set_error_bounds_u32(b1, b2)
        .build()
    )


class TestBuilder:
    def test_build_basic(self):
        p = make_params()
        assert (p.n, p.k, p.l) == (3, 4, 8)
        assert p.t == 1
        assert p.moduli() == MODULI

    def test_missing_fields(self):
        with pytest.raises(InvalidParameters, match="n not set"):
            PvwParametersBuilder().build()
        with pytest.raises(InvalidParameters, match="k not set"):
            PvwParametersBuilder().set_parties(3).build()
        with pytest.raises(InvalidParameters, match="moduli not set"):
            PvwParametersBuilder().set_parties(3).set_dimension(4).set_l(8).build()

    def test_invalid_l(self):
        for l in (4, 6, 12):
            with pytest.raises(InvalidParameters, match="power of 2"):
                (PvwParametersBuilder().set_parties(3).set_dimension(4)
                 .set_l(l).set_moduli(MODULI).build())

    def test_zero_dimensions(self):
        with pytest.raises(InvalidParameters, match="n must be > 0"):
            (PvwParametersBuilder().set_parties(0).set_dimension(4)
             .set_l(8).set_moduli(MODULI).build())
        with pytest.raises(InvalidParameters, match="k must be > 0"):
            (PvwParametersBuilder().set_parties(3).set_dimension(0)
             .set_l(8).set_moduli(MODULI).build())

    def test_negative_bounds(self):
        with pytest.raises(InvalidParameters, match="error_bound_1 must be positive"):
            (PvwParametersBuilder().set_parties(3).set_dimension(4).set_l(8)
             .set_moduli(MODULI).set_error_bounds(0, 5).build())

    def test_defaults(self):
        p = (PvwParametersBuilder().set_parties(3).set_dimension(4).set_l(8)
             .set_moduli(MODULI).build())
        assert p.secret_variance == 0.5
        assert p.error_bound_1 == 100
        assert p.error_bound_2 == 200

    def test_delta_computation(self):
        p = make_params()
        q = 1
        for m in MODULI:
            q *= m
        assert p.q_total() == q
        d = p.delta()
        assert d ** p.l <= q < (d + 1) ** p.l
        assert p.delta_power_l_minus_1() == d ** (p.l - 1)


class TestGadget:
    def test_gadget_vector(self):
        p = make_params()
        gv = p.gadget_vector()
        assert gv[0] == 1
        d = p.delta()
        for i in range(1, p.l):
            assert gv[i] == gv[i - 1] * d
        assert p.gadget_element() == list(reversed(gv))

    def test_gadget_polynomial_structure(self):
        """tests/crypto.rs:17-44 validate_encoding."""
        p = make_params()
        gp = p.gadget_polynomial().to_power_basis()
        coeffs = gp.coefficients_int()
        exp = 1
        for i in range(p.l):
            assert int(coeffs[i]) == exp
            if i < p.l - 1:
                exp *= p.delta()

    def test_encode_scalar(self):
        p = make_params()
        enc = p.encode_scalar(42).to_power_basis()
        coeffs = enc.coefficients_int()
        q = p.q_total()
        exp = 42
        for i in range(p.l):
            assert int(coeffs[i]) == exp % q
            exp *= p.delta()

    def test_encode_scalar_u64_wrap(self):
        """u64 scalars >= 2^63 wrap to negative i64 (encryption.rs:195)."""
        p = make_params()
        s = (1 << 64) - 5  # as i64: -5
        enc = p.encode_scalar(s).to_power_basis()
        coeffs = enc.coefficients_int()
        q = p.q_total()
        assert int(coeffs[0]) == (-5) % q

    def test_bigints_to_poly_round_trip(self):
        """tests/params.rs:588-635."""
        p = make_params()
        vals = [123456789, -987654321, 0, 1, -1, p.delta(), 2**100, -(2**90)]
        poly = p.bigints_to_poly(vals)
        got = poly.coefficients_int()
        q = p.q_total()
        for i, v in enumerate(vals):
            assert int(got[i]) == v % q

    def test_bigints_to_poly_wrong_len(self):
        p = make_params()
        with pytest.raises(InvalidParameters, match="Expected 8 coefficients"):
            p.bigints_to_poly([1, 2, 3])

    def test_scalar_to_polynomial(self):
        p = make_params()
        sp = p.scalar_to_polynomial(7).to_power_basis()
        coeffs = sp.coefficients_int()
        assert int(coeffs[0]) == 7
        assert all(int(c) == 0 for c in coeffs[1:])


class TestCorrectness:
    def test_correctness_condition_holds_for_suggested(self):
        p = make_params()
        assert p.verify_correctness_condition()
        assert p.verify_parameters()

    def test_correctness_condition_fails_for_huge_bounds(self):
        p = (PvwParametersBuilder().set_parties(3).set_dimension(4).set_l(8)
             .set_moduli(MODULI).set_error_bounds(2**200, 2**200).build())
        assert not p.verify_correctness_condition()

    def test_suggest_error_bounds_grid(self):
        b1, b2 = PvwParameters.suggest_error_bounds(3, 4, 8, MODULI, 0.5)
        assert b1 in (50, 100, 200, 500, 1000, 2000)
        assert b2 in (50, 100, 200, 500, 1000, 2000)

    def test_suggest_error_bounds_impossible(self):
        # Single tiny modulus, large l: delta = 1 so delta^(l-1) = 1
        small = (193,)  # prime ≡ 1 mod 64
        with pytest.raises(PvwError, match="Cannot find suitable error bounds"):
            PvwParameters.suggest_error_bounds(1000, 2048, 32, small, 0.5)


class TestCrs:
    def test_deterministic_generation(self):
        """tests/params.rs:88-131: same seed => identical, different => differs."""
        p = make_params()
        seed = bytes(range(32))
        crs1 = PvwCrs.new_deterministic(p, seed)
        crs2 = PvwCrs.new_deterministic(p, seed)
        assert np.array_equal(crs1.matrix.residues_np(), crs2.matrix.residues_np())
        crs3 = PvwCrs.new_deterministic(p, bytes(32))
        assert not np.array_equal(crs1.matrix.residues_np(), crs3.matrix.residues_np())

    def test_crs_from_tag(self):
        """tests/params.rs:134: same tag => same CRS."""
        p = make_params()
        a = PvwCrs.new_from_tag(p, "test-tag")
        b = PvwCrs.new_from_tag(p, "test-tag")
        c = PvwCrs.new_from_tag(p, "other-tag")
        assert np.array_equal(a.matrix.residues_np(), b.matrix.residues_np())
        assert not np.array_equal(a.matrix.residues_np(), c.matrix.residues_np())

    def test_random_crs_validate(self):
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        crs.validate()
        assert crs.dimensions() == (p.k, p.k)
        assert len(crs) == p.k * p.k
        assert not crs.is_empty()
        # residues in range
        res = crs.matrix.residues_np()
        for i, q in enumerate(MODULI):
            assert res[..., i, :].max() < q

    def test_crs_get(self):
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(1))
        assert crs.get(0, 0) is not None
        assert crs.get(p.k, 0) is None

    def test_multiply_by_randomness_linearity(self):
        """A·(r1 + r2) == A·r1 + A·r2 (exercises the matvec product)."""
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(2))
        r1 = Poly.random(p.ring, Representation.Ntt, jax.random.key(3), (p.k,))
        r2 = Poly.random(p.ring, Representation.Ntt, jax.random.key(4), (p.k,))
        lhs = crs.multiply_by_randomness(r1 + r2)
        rhs = crs.multiply_by_randomness(r1) + crs.multiply_by_randomness(r2)
        assert np.array_equal(lhs.residues_np(), rhs.residues_np())


class TestDeterministicStreams:
    """Golden vectors pinning OUR deterministic conventions so they can
    never drift silently (the reference has no golden vectors at all —
    SURVEY.md §4 calls this out as a gap)."""

    def test_chacha8_known_vector(self):
        # ECRYPT ChaCha8 zero-key/zero-IV keystream
        ks = chacha_blocks(bytes(32), 0, 1)
        assert ks[:16].hex() == "3e00ef2f895f40d67f5bb8e81f09a5a1"

    def test_siphash13_stability(self):
        assert siphash13(b"") == siphash13(b"")
        assert siphash13(b"a") != siphash13(b"b")

    def test_tag_seed_golden(self):
        assert tag_seed("test")[:8].hex() == "9dcb812b39e0b9df"

    def test_crs_golden(self):
        """First CRS element for a fixed seed — golden-pinned."""
        p = make_params()
        crs = PvwCrs.new_deterministic(p, bytes(range(32)))
        first = int(crs.matrix.residues_np()[0, 0, 0, 0])
        assert first == self._expected_first(p), first

    @staticmethod
    def _expected_first(p):
        # independently recompute from the documented stream layout
        from pvw_tpu.utils.chacha import uniform_residues_from_seeds
        master = ChaCha8Rng(bytes(range(32)))
        seed0 = np.frombuffer(master.next_bytes(32), np.uint8)[None]
        vals = uniform_residues_from_seeds(seed0, p.ring.moduli, p.ring.degree)
        return int(vals[0, 0, 0])


class TestSerdeDict:
    def test_params_roundtrip(self):
        p = make_params()
        d = p.to_dict()
        p2 = PvwParameters.from_dict(d)
        assert p == p2
        assert p2.delta() == p.delta()


class TestMoreReferenceParity:
    def test_compare_conversion_paths(self):
        """tests/params.rs:733-767: bigints_to_poly and from_coefficients
        must agree for small signed values."""
        from pvw_tpu.poly import Poly

        p = make_params()
        vals = [5, -3, 0, 100, -100, 1, -1, 7]
        a = p.bigints_to_poly(vals)
        b = Poly.from_coefficients(np.array(vals, np.int32), p.ring)
        assert np.array_equal(a.residues_np(), b.residues_np())

    def test_bigints_to_poly_negative_values(self):
        """tests/params.rs:551-585: negatives wrap per modulus."""
        p = make_params()
        vals = [-1, -(2**40), -(2**100), -5, 0, 0, 0, 0]
        got = p.bigints_to_poly(vals).residues_np()
        for li, q in enumerate(MODULI):
            for ci, v in enumerate(vals):
                assert int(got[li, ci]) == v % q

    def test_different_parameter_sizes(self):
        """tests/params.rs:253-274."""
        for n, k, l in ((2, 8, 8), (5, 16, 16), (3, 8, 32)):
            p = make_params(n=n, k=k, l=l)
            assert (p.n, p.k, p.l) == (n, k, l)
            assert p.t == (n - 1) // 2

    def test_variance_types(self):
        """tests/params.rs:369-...: non-default variances build fine."""
        for var in (0.5, 1.0, 4.0, 16.0):
            p = (PvwParametersBuilder().set_parties(3).set_dimension(4)
                 .set_l(8).set_moduli(MODULI).set_secret_variance(var)
                 .set_error_bounds_u32(50, 100).build())
            assert p.secret_variance == var


class TestPresets:
    def test_all_presets_build(self):
        from pvw_tpu.params import presets

        small_overrides = {
            "toy": {}, "vector_k256": {"n": 8},
            "shares_n1024": {"n": 8}, "pvss_8192": {"n": 8},
            "secure_128_reference": {},
        }
        for name, kw in small_overrides.items():
            p = presets.get_preset(name, **kw)
            assert p.verify_correctness_condition(), name

    def test_deep_presets_build(self):
        from pvw_tpu.params import presets

        p = presets.get_preset("broadcast_128bit", n=4)
        assert p.q_total().bit_length() >= 1024
        assert p.verify_correctness_condition()

    def test_unknown_preset(self):
        from pvw_tpu.params import presets

        with pytest.raises(InvalidParameters, match="unknown preset"):
            presets.get_preset("nope")
