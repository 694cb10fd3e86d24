"""pvw-tpu: TPU-native PVW multi-receiver LWE encryption.

A from-scratch JAX/Pallas implementation of the PVW scheme (eprint
2021/1397 §2.5) with the full capability surface of ``gnosisguild/pvw-rs``
(reference at ``/root/reference``): vector / share-distribution / broadcast
encryption, per-party decryption with PVW gadget decoding, threshold
subset decryption, parameter validation and bound suggestion, deterministic
CRS generation, and serialization.

Module map (mirrors ``src/lib.rs:14-19``):
- ``params``   — PvwParameters(Builder), PvwCrs, RingPlan
- ``keys``     — SecretKey, Party, PublicKey, GlobalPublicKey
- ``crypto``   — encrypt*, decrypt*, threshold helpers, PvwCiphertext
- ``sampling`` — CBD, bounded uniform, truncated Gaussian
- ``errors``   — the PvwError hierarchy
- ``ops``      — the TPU kernels (digit matmuls, NTT, u32-lane u64 math)
- ``parallel`` — multi-chip mesh sharding (no reference analogue; the
                 reference's only parallelism is a rayon thread pool)
"""

from . import config, crypto, errors, keys, params, sampling, traits  # noqa: F401
from .config import settings  # noqa: F401  (runtime tuning knobs)
from .errors import PvwError, PvwResult
from .poly import Poly, Representation
from .params import PvwCrs, PvwParameters, PvwParametersBuilder, RingPlan
from .keys import GlobalPublicKey, Party, PublicKey, SecretKey
from .crypto import (
    PvwCiphertext,
    decrypt_party_shares,
    decrypt_party_value,
    decrypt_valid_shares,
    encrypt,
    encrypt_all_party_shares,
    encrypt_all_party_shares_batched,
    encrypt_batch,
    encrypt_broadcast,
    encrypt_party_shares,
    select_valid_ciphertexts,
)
from .sampling import (  # noqa: F401  (root re-exports, lib.rs:22-28)
    sample_bigint_normal_vec,
    sample_discrete_gaussian_vec,
    sample_uniform_coefficients,
    sample_vec_cbd,
)
from .traits import Encode, Serialize, Validate  # noqa: F401

__version__ = "0.1.0"


# ``prelude`` (``src/lib.rs:31-49``) — flat namespace for easy importing.
class prelude:
    from .keys import GlobalPublicKey, Party, PublicKey, SecretKey
    from .params import PvwCrs, PvwParameters, PvwParametersBuilder
    from .errors import PvwError, PvwResult
    from .crypto import (
        PvwCiphertext,
        decrypt_party_shares,
        decrypt_party_value,
        encrypt,
    )
    from .sampling import (
        sample_bigint_normal_vec,
        sample_discrete_gaussian_vec,
        sample_uniform_coefficients,
        sample_vec_cbd,
    )
    from .traits import Encode, Serialize, Validate


def demo_roundtrip(verbose: bool = True) -> bool:
    """Minimal end-to-end slice: toy params -> CRS -> keygen -> encrypt ->
    per-party decrypt -> verify (the ``examples/pvw.rs`` flow at tiny
    scale). Used by the project verify skill; returns True on success."""
    import jax
    import numpy as np

    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    n, k, l = 3, 8, 8
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    p = (
        PvwParametersBuilder()
        .set_parties(n).set_dimension(k).set_l(l).set_moduli(moduli)
        .set_secret_variance(0.5).set_error_bounds_u32(b1, b2)
        .build()
    )
    key = jax.random.key(0)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 1))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, p, jax.random.fold_in(key, 100 + i)) for i in range(n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 2))
    scalars = np.array([11, 22, 33], np.uint64)
    ct = encrypt(scalars, gpk, jax.random.fold_in(key, 3))
    ok = True
    for i, party in enumerate(parties):
        got = decrypt_party_value(ct, party.secret_key, i)
        if verbose:
            print(f"party {i}: decrypted {got}, expected {int(scalars[i])}")
        ok &= got == int(scalars[i])
    if verbose:
        print("round-trip", "OK" if ok else "FAILED")
    return ok
