"""Golden pipeline vectors: fixed seeds must produce byte-identical
artifacts forever.

The reference has no golden vectors at all (SURVEY.md §4 flags this as a
gap); since every pvw-tpu sampling path is counter-based, the entire
pipeline is pinnable. If any of these hashes change, either the
deterministic stream layout or the kernel arithmetic changed — both are
compatibility breaks that must be release-noted, not silent.

(The pins assume jax's default threefry bit stream; a jax upgrade that
changes it would trip these tests loudly, which is the desired behavior.)

Stream history: v3 (adaptive draw width — bounded-uniform draws use 96
random bits when range < 2^30, still < 2^-66 statistical distance;
changed gpk/ciphertext pins). v2 introduced row-keyed sampling — r/e1/e2
rows derive from fold_in(key, global_row) so mesh shards sample only
their rows. v1 was whole-array 128-bit draws.
"""

import hashlib

import numpy as np
import jax
import pytest

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    encrypt_batch,
)

MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


def _h(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


@pytest.fixture(scope="module")
def system():
    b1, b2 = PvwParameters.suggest_error_bounds(4, 8, 8, MODULI, 0.5)
    p = (PvwParametersBuilder().set_parties(4).set_dimension(8).set_l(8)
         .set_moduli(MODULI).set_secret_variance(0.5)
         .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(1234)
    crs = PvwCrs.new_deterministic(p, bytes(range(32)))
    parties = [Party.new(i, p, jax.random.fold_in(key, i)) for i in range(4)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 99))
    return p, crs, gpk, parties, key


def test_crs_hash(system):
    _, crs, _, _, _ = system
    assert _h(crs.matrix.residues_np()) == "87295f5306ea364d"


def test_secret_key_hash(system):
    _, _, _, parties, _ = system
    assert _h(np.stack([pt.secret_key.secret_coeffs for pt in parties])) == (
        "d3bc51f25628c4f5"
    )


def test_global_pk_hash(system):
    _, _, gpk, _, _ = system
    assert _h(gpk.matrix.residues_np()) == "8d40adf52c1c9af2"


def test_ciphertext_hash(system):
    p, _, gpk, _, key = system
    sc = np.arange(2 * p.n, dtype=np.uint64).reshape(2, p.n)
    ct = encrypt_batch(sc, gpk, jax.random.fold_in(key, 7))
    assert _h(ct.c1.residues_np()) == "9c7654078768ba8f"
    assert _h(ct.c2.residues_np()) == "2d627fd108fc81bd"
