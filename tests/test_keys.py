"""Key-management suite — mirror of ``/root/reference/tests/keys.rs``."""

import numpy as np
import jax
import pytest

from pvw_tpu import (
    GlobalPublicKey, Party, PublicKey, PvwCrs, PvwParameters,
    PvwParametersBuilder, SecretKey,
)
from pvw_tpu.errors import DimensionMismatch, InvalidParameters

MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


def make_params(n=3, k=4, l=8, var=0.5):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, MODULI, var)
    return (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
            .set_moduli(MODULI).set_secret_variance(var)
            .set_error_bounds_u32(b1, b2).build())


class TestSecretKey:
    def test_generation(self):
        """tests/keys.rs:275-307: CBD range {-1,0,1}, non-zero."""
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(0))
        assert sk.secret_coeffs.shape == (p.k, p.l)
        assert sk.secret_coeffs.min() >= -1
        assert sk.secret_coeffs.max() <= 1
        assert np.any(sk.secret_coeffs != 0)

    def test_ternary_distribution(self):
        """tests/keys.rs:579-620: variance-0.5 keys are ternary and roughly
        balanced."""
        p = make_params(k=64)
        sk = SecretKey.random(p, jax.random.key(1))
        vals, counts = np.unique(sk.secret_coeffs, return_counts=True)
        assert set(vals.tolist()) <= {-1, 0, 1}
        # ~25% -1, 50% 0, 25% +1
        frac0 = counts[vals.tolist().index(0)] / sk.secret_coeffs.size
        assert 0.35 < frac0 < 0.65

    def test_deterministic(self):
        p = make_params()
        a = SecretKey.random(p, jax.random.key(7))
        b = SecretKey.random(p, jax.random.key(7))
        assert np.array_equal(a.secret_coeffs, b.secret_coeffs)

    def test_to_polynomials(self):
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(0))
        polys = sk.to_polynomials()
        assert polys.batch_shape == (p.k,)
        # round-trip: inverse NTT -> coefficients == CBD coeffs mod q
        pb = polys.to_power_basis()
        res = pb.residues_np()
        for j, q in enumerate(MODULI):
            want = np.vectorize(lambda c: int(c) % q, otypes=[object])(sk.secret_coeffs)
            np.testing.assert_array_equal(res[:, j, :].astype(object), want)

    def test_get_polynomial_bounds(self):
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(0))
        sk.get_polynomial(p.k - 1)
        with pytest.raises(InvalidParameters, match="out of bounds"):
            sk.get_polynomial(p.k)

    def test_from_coefficients_validation(self):
        p = make_params()
        SecretKey.from_coefficients(p, np.zeros((p.k, p.l), np.int32))
        with pytest.raises(InvalidParameters, match="polynomials but k="):
            SecretKey.from_coefficients(p, np.zeros((p.k + 1, p.l), np.int32))
        with pytest.raises(InvalidParameters):
            SecretKey.from_coefficients(p, np.zeros((p.k, p.l + 2), np.int32))

    def test_zeroize(self):
        """tests/keys.rs:515-538."""
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(0))
        _ = sk.to_polynomials()
        sk.zeroize()
        assert sk.is_empty()
        assert sk._poly_cache is None

    def test_coefficient_stats(self):
        p = make_params()
        sk = SecretKey.from_coefficients(
            p, np.tile(np.array([[-1, 0, 1, 0, 1, -1, 0, 0]], np.int32), (p.k, 1))
        )
        mn, mx, mean = sk.coefficient_stats()
        assert (mn, mx) == (-1, 1)
        assert mean == 0.0

    def test_legacy_methods(self):
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(0))
        assert np.array_equal(sk.to_coefficient_matrix(), sk.secret_coeffs)
        assert np.array_equal(sk.as_matrix(), sk.secret_coeffs)
        assert sk.as_poly_vector().batch_shape == (p.k,)


class TestParty:
    def test_new_validates_index(self):
        p = make_params()
        Party.new(p.n - 1, p, jax.random.key(0))
        with pytest.raises(InvalidParameters, match="exceeds maximum"):
            Party.new(p.n, p, jax.random.key(0))

    def test_accessors(self):
        p = make_params()
        party = Party.new(1, p, jax.random.key(0))
        assert party.get_index() == 1
        assert party.get_secret_key() is party.secret_key


class TestPublicKey:
    def test_generate_structure(self):
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        sk = SecretKey.random(p, jax.random.key(1))
        pk, errors = PublicKey.generate(sk, crs, jax.random.key(2))
        pk.validate()
        assert pk.dimension() == p.k
        assert errors.batch_shape == (p.k,)

    def test_b_equals_sta_plus_e(self):
        """b - s^T A == e exactly."""
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        sk = SecretKey.random(p, jax.random.key(1))
        pk, errors = PublicKey.generate(sk, crs, jax.random.key(2))
        sta = crs.multiply_by_secret_key(sk)
        diff = pk.key_polynomials - sta
        assert np.array_equal(diff.residues_np(), errors.residues_np())

    def test_error_bound_respected(self):
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        sk = SecretKey.random(p, jax.random.key(1))
        _, errors = PublicKey.generate(sk, crs, jax.random.key(2))
        coeffs = errors.to_power_basis().coefficients_int()
        q = p.q_total()
        for v in coeffs.ravel():
            c = int(v)
            centered = c - q if c > q // 2 else c
            assert abs(centered) <= p.error_bound_1

    def test_dimension_validation(self):
        """tests/keys.rs:223-244: mismatched k fails."""
        p1 = make_params(k=4)
        p2 = make_params(k=8)
        crs = PvwCrs.new(p1, jax.random.key(0))
        sk = SecretKey.random(p2, jax.random.key(1))
        with pytest.raises(DimensionMismatch):
            PublicKey.generate(sk, crs, jax.random.key(2))


class TestGlobalPublicKey:
    def test_lifecycle(self):
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        assert gpk.dimensions() == (p.n, p.k)
        assert gpk.num_public_keys() == 0
        assert not gpk.is_full()
        for i in range(p.n):
            party = Party.new(i, p, jax.random.fold_in(jax.random.key(1), i))
            gpk.generate_and_add_party(party, jax.random.fold_in(jax.random.key(2), i))
        assert gpk.is_full()
        assert gpk.num_public_keys() == p.n
        gpk.validate()

    def test_batch_key_generation_matches_sequential(self):
        """tests/keys.rs:145 (rayon path) — here: the batched MXU path must
        agree exactly with per-party generation given the same keys."""
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        parties = [Party.new(i, p, jax.random.fold_in(jax.random.key(1), i))
                   for i in range(p.n)]
        g1 = GlobalPublicKey(crs)
        g1.generate_all_party_keys(parties, jax.random.key(5))
        assert g1.is_full()
        # sk^T A consistency: B row i - e_i == s_i^T A; just check structure +
        # determinism of the batch path
        g2 = GlobalPublicKey(crs)
        g2.generate_all_party_keys(parties, jax.random.key(5))
        assert np.array_equal(g1.matrix.residues_np(), g2.matrix.residues_np())

    def test_batch_keygen_index_placement(self):
        """The slice-update/replacement fast paths must place rows by
        INDEX like the scatter path did: a contiguous block not starting
        at 0 lands at its indices (row 0 untouched), and a shifted
        full-length block (indices 1..n, one out of range) must NOT take
        the whole-matrix replacement — the out-of-range row is dropped."""
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        sks = [Party.new(i, p, jax.random.fold_in(jax.random.key(1), i))
               .secret_key for i in range(p.n)]
        # partial contiguous block [1, 2] — slice-update path
        part = GlobalPublicKey(crs)
        part._batch_generate(sks[1:3], [1, 2], jax.random.key(5),
                             record_errors=False)
        got = part.matrix.residues_np()
        assert np.all(got[0] == 0)  # row 0 untouched
        assert np.any(got[1] != 0) and np.any(got[2] != 0)
        # shifted full-length block [1..n] (index n out of range): must
        # fall back to scatter semantics — rows 1..n-1 written, row 0
        # untouched, index n dropped (NOT a whole-matrix replacement that
        # would shift every key into the wrong row)
        shifted = GlobalPublicKey(crs)
        shifted._batch_generate(sks, list(range(1, p.n + 1)),
                                jax.random.key(5), record_errors=False)
        sg = shifted.matrix.residues_np()
        assert np.all(sg[0] == 0)
        for i in range(1, p.n):
            assert np.any(sg[i] != 0)

    def test_num_keys_quirk(self):
        """public_key.rs:244-247: adding only party 2 marks keys 0-2 present."""
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        party = Party.new(2, p, jax.random.key(1))
        pk = party.generate_public_key(gpk.crs, jax.random.key(2))
        gpk.add_public_key(2, pk)
        assert gpk.num_public_keys() == 3
        assert gpk.is_full()  # n == 3; quirk preserved
        assert gpk.get_public_key(0) is not None  # row of zeros "present"

    def test_add_public_key_bounds(self):
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        party = Party.new(0, p, jax.random.key(1))
        pk = party.generate_public_key(gpk.crs, jax.random.key(2))
        with pytest.raises(InvalidParameters, match="exceeds maximum"):
            gpk.add_public_key(p.n, pk)

    def test_error_capture(self):
        """public_key.rs:304-328."""
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        sk = SecretKey.random(p, jax.random.key(1))
        gpk.generate_and_add_with_errors(1, sk, jax.random.key(2))
        assert gpk.get_party_errors(0) is None
        errs = gpk.get_party_errors(1)
        assert errs is not None and errs.batch_shape == (p.k,)
        assert len(gpk.get_all_errors()) == 2

    def test_get_party_polynomials(self):
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        with pytest.raises(InvalidParameters, match="not found"):
            gpk.get_party_polynomials(0)
        sk = SecretKey.random(p, jax.random.key(1))
        gpk.generate_and_add(0, sk, jax.random.key(2))
        row = gpk.get_party_polynomials(0)
        assert row.batch_shape == (p.k,)

    def test_too_many_parties(self):
        p = make_params()
        crs = PvwCrs.new(p, jax.random.key(0))
        gpk = GlobalPublicKey(crs)
        parties = [Party.new(i % p.n, p, jax.random.key(i)) for i in range(p.n + 1)]
        with pytest.raises(InvalidParameters, match="Too many parties"):
            gpk.generate_all_party_keys(parties, jax.random.key(9))


class TestMoreReferenceParity:
    def test_full_capacity(self):
        """tests/keys.rs:247-273: filling all n slots."""
        p = make_params()
        gpk = GlobalPublicKey(PvwCrs.new(p, jax.random.key(0)))
        for i in range(p.n):
            sk = SecretKey.random(p, jax.random.fold_in(jax.random.key(1), i))
            gpk.generate_and_add(i, sk, jax.random.fold_in(jax.random.key(2), i))
        assert gpk.is_full()
        for i in range(p.n):
            assert gpk.get_public_key(i) is not None
        assert gpk.get_public_key(p.n) is None

    def test_custom_secret_variance(self):
        """tests/keys.rs:431-460: CBD(4) keys bounded by 2*4."""
        p = make_params(var=4.0)
        sk = SecretKey.random(p, jax.random.key(3))
        assert np.abs(sk.secret_coeffs).max() <= 8
        assert sk.secret_coeffs.var() > 1.0  # clearly wider than ternary
        sk.validate_coefficient_bounds()  # bound 8 passes for integer var

    def test_mutable_coefficient_access(self):
        """tests/keys.rs:410-429: mutation invalidates the poly cache."""
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(4))
        before = sk.to_polynomials().residues_np().copy()
        sk.coefficients_mut()[0, 0] += 1
        after = sk.to_polynomials().residues_np()
        assert not np.array_equal(before, after)

    def test_polynomial_conversion_on_demand(self):
        """tests/keys.rs:364-386: get_polynomial(i) equals row i of the
        batch conversion."""
        p = make_params()
        sk = SecretKey.random(p, jax.random.key(5))
        row2 = sk.get_polynomial(2)
        batch = sk.to_polynomials()
        assert np.array_equal(row2.residues_np(), batch.residues_np()[2])


class TestDeviceKeygen:
    def test_generate_all_keys_device_matches_host_path(self):
        """The device-resident batch keygen must produce the identical key
        matrix as generate_all_keys on SecretKeys built from the same
        coefficients (same stream, same kernel, no host round trip)."""
        import jax.numpy as jnp

        from pvw_tpu.sampling.cbd import sample_vec_cbd

        params = make_params(n=6, k=16)
        key = jax.random.key(42)
        crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
        coeffs = sample_vec_cbd(
            jax.random.fold_in(key, 7), (6, params.k, params.l),
            params.secret_variance,
        )
        host = np.asarray(coeffs)
        sks = [SecretKey(params, host[i]) for i in range(6)]
        g1 = GlobalPublicKey(crs)
        g1.generate_all_keys(sks, jax.random.fold_in(key, 1))
        g2 = GlobalPublicKey(crs)
        g2.generate_all_keys_device(coeffs, jax.random.fold_in(key, 1))
        np.testing.assert_array_equal(
            g1.matrix.residues_np(), g2.matrix.residues_np()
        )
        assert g2.is_full()
