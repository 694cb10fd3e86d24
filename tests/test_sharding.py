"""Multi-device sharding suite: the sharded encrypt/decrypt paths must be
BIT-IDENTICAL to the single-device kernels on any mesh shape (counter-based
RNG makes this well-defined), and must actually run over an 8-device mesh
(virtual CPU devices; see conftest.py)."""

import numpy as np
import jax
import pytest

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    encrypt_batch, decrypt_party_shares,
)
from pvw_tpu.errors import InvalidParameters
from pvw_tpu.parallel import (
    decrypt_party_shares_sharded, encrypt_batch_sharded, make_mesh,
)

MODULI = (0xFFFFEE001, 0xFFFFC4001)


def setup_system(n=8, k=8, l=8, seed=0):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, MODULI, 0.5)
    p = (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
         .set_moduli(MODULI).set_secret_variance(0.5)
         .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(seed)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 0))
    parties = [Party.new(i, p, jax.random.fold_in(key, 100 + i))
               for i in range(p.n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    return p, gpk, parties


def test_device_count():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"


@pytest.mark.parametrize("recv,kdim", [(8, 1), (4, 2), (2, 4)])
def test_sharded_encrypt_bit_identical(recv, kdim):
    p, gpk, _ = setup_system()
    mesh = make_mesh(jax.devices(), kdim=kdim)
    assert mesh.shape == {"recv": recv, "kdim": kdim}
    scalars = np.arange(2 * p.n, dtype=np.uint64).reshape(2, p.n)
    key = jax.random.key(7)
    ct_ref = encrypt_batch(scalars, gpk, key)
    ct_sh = encrypt_batch_sharded(scalars, gpk, key, mesh)
    np.testing.assert_array_equal(ct_ref.c1.residues_np(), ct_sh.c1.residues_np())
    np.testing.assert_array_equal(ct_ref.c2.residues_np(), ct_sh.c2.residues_np())


def test_sharded_roundtrip():
    p, gpk, parties = setup_system()
    mesh = make_mesh(jax.devices(), kdim=2)
    vectors = np.array(
        [[d * 100 + r + 1 for r in range(p.n)] for d in range(p.n)], np.uint64
    )
    ct = encrypt_batch_sharded(vectors, gpk, jax.random.key(3), mesh)
    for pi in (0, 3, 7):
        shares = decrypt_party_shares_sharded(
            ct, parties[pi].secret_key, pi, mesh
        )
        assert shares == [int(vectors[d][pi]) for d in range(p.n)]
        # and identical to the unsharded decrypt
        assert shares == decrypt_party_shares(ct, parties[pi].secret_key, pi)


def test_mesh_divisibility_validation():
    p, gpk, _ = setup_system(n=6, k=8)
    mesh = make_mesh(jax.devices(), kdim=2)  # recv=4 does not divide n=6
    scalars = np.zeros((1, p.n), np.uint64)
    with pytest.raises(InvalidParameters, match="must divide"):
        encrypt_batch_sharded(scalars, gpk, jax.random.key(0), mesh)


def test_make_mesh_validation():
    with pytest.raises(InvalidParameters, match="not divisible"):
        make_mesh(jax.devices(), kdim=3)
