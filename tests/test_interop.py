"""Round-trip tests for the pvw_tpu.interop value-exchange module."""

import numpy as np
import jax
import pytest

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
)
from pvw_tpu import interop
from pvw_tpu.crypto.decryption import decrypt_party_value
from pvw_tpu.crypto.encryption import encrypt
from pvw_tpu.errors import SerializationError


def _system(n=3, k=16, l=8, seed=3):
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
              .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(seed)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, params, jax.random.fold_in(key, 10 + i))
               for i in range(n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    return params, crs, gpk, parties


def test_dump_load_roundtrip(tmp_path):
    """Full case: params + CRS + secret keys + ciphertext through a JSON
    file and back; the loaded ciphertext must decrypt with the loaded
    keys to the recorded plaintexts."""
    params, crs, gpk, parties = _system()
    scalars = [11, 22, 33]
    ct = encrypt(scalars, gpk, jax.random.key(99))
    path = str(tmp_path / "case.json")
    interop.dump_case(
        params, crs=crs, secret_keys=[p.secret_key for p in parties],
        ciphertext=ct, scalars=scalars, plaintexts=scalars, path=path)

    loaded = interop.load_case(path)
    assert loaded.params == params
    # identity bridge (our own probe solves to the identity permutation)
    assert loaded.bridge.perms == [list(range(params.l))
                                   for _ in params.ring.moduli]
    np.testing.assert_array_equal(
        loaded.crs.matrix.residues_np(), crs.matrix.residues_np())
    for sk, party in zip(loaded.secret_keys, parties):
        np.testing.assert_array_equal(
            sk.coefficients(), party.secret_key.coefficients())
    for i, sk in enumerate(loaded.secret_keys):
        assert decrypt_party_value(loaded.ciphertext, sk, i) == scalars[i]


def test_foreign_order_roundtrip():
    """Export through a non-identity bridge (simulating a foreign NTT
    slot order) and re-import by solving the probe — the values must
    survive exactly."""
    params, crs, gpk, parties = _system(seed=8)
    ring = params.ring
    rng = np.random.default_rng(5)
    sigma = [[int(v) for v in rng.permutation(ring.degree)]
             for _ in range(ring.num_limbs)]
    foreign = interop.NttBridge(sigma)
    # a foreign implementation's probe: slot s evaluates at psi^(2*sigma[s]+1)
    probe = [[str(pow(limb.psi, 2 * sigma[i][s] + 1, limb.q))
              for s in range(ring.degree)]
             for i, limb in enumerate(ring.limbs)]
    scalars = [5, 6, 7]
    ct = encrypt(scalars, gpk, jax.random.key(4))
    crs_d = interop.export_crs(crs, bridge=foreign)
    ct_d = interop.export_ciphertext(ct, bridge=foreign)

    solved = interop.solve_ntt_bridge(params, {"x_monomial_ntt": probe})
    assert solved.perms == sigma
    crs2 = interop.load_crs(crs_d, params, solved)
    np.testing.assert_array_equal(
        crs2.matrix.residues_np(), crs.matrix.residues_np())
    ct2 = interop.load_ciphertext(ct_d, params, solved)
    for i, party in enumerate(parties):
        assert decrypt_party_value(ct2, party.secret_key, i) == scalars[i]


def test_bridge_inverse():
    params, _, _, _ = _system()
    rng = np.random.default_rng(1)
    sigma = [[int(v) for v in rng.permutation(params.l)]
             for _ in params.ring.moduli]
    b = interop.NttBridge(sigma)
    res = rng.integers(0, 1 << 34, (5, len(sigma), params.l), np.uint64)
    np.testing.assert_array_equal(b.to_ours(b.to_foreign(res)), res)
    np.testing.assert_array_equal(b.to_foreign(b.to_ours(res)), res)


def test_schema_and_probe_errors():
    params, _, _, _ = _system()
    with pytest.raises(SerializationError, match="unknown schema"):
        interop.load_case({"schema": "bogus"})
    bad = [["1"] * params.l for _ in params.ring.moduli]  # 1 is not a root
    with pytest.raises(SerializationError, match="primitive"):
        interop.solve_ntt_bridge(params, {"x_monomial_ntt": bad})


def test_params_export_fields_match_schema():
    params, _, _, _ = _system()
    d = interop.export_params(params)
    assert set(d) == {"n", "k", "l", "moduli", "secret_variance",
                      "error_bound_1", "error_bound_2"}
    assert interop.load_params(d) == params
