"""Exchange PVW material by value via pvw_tpu.interop (pvw-vectors-v1).

Demonstrates the buildable half of wire-format parity with pvw-rs
(PARITY.md): a deployment dumps parameters, CRS, secret keys, and a
ciphertext to the documented JSON schema; any consumer (including a
pvw-rs side following tests/vectors/README.md) reloads them and
decrypts, with NTT slot order bridged through the monomial probe.

Run: python examples/interop_exchange.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    decrypt_party_value, encrypt, interop,
)


def main() -> None:
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    n, k, l = 5, 32, 8
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
              .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, params, jax.random.fold_in(key, 10 + i))
               for i in range(n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))

    scalars = np.array([101, 202, 303, 404, 505], np.uint64)
    ct = encrypt(scalars, gpk, jax.random.fold_in(key, 2))

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "exchange.json")
        interop.dump_case(
            params, crs=crs, secret_keys=[p.secret_key for p in parties],
            ciphertext=ct, scalars=scalars.tolist(),
            plaintexts=scalars.tolist(), path=path)
        print(f"dumped pvw-vectors-v1 case "
              f"({os.path.getsize(path) / 1024:.0f} KiB)")

        loaded = interop.load_case(path)
        assert loaded.params == params
        print("params round-tripped; NTT bridge:",
              "identity" if loaded.bridge.perms[0] ==
              list(range(params.l)) else "permuted")
        for i, sk in enumerate(loaded.secret_keys):
            got = decrypt_party_value(loaded.ciphertext, sk, i)
            print(f"  party {i}: decrypted {got}, expected {int(scalars[i])}")
            assert got == int(scalars[i])
    print("interop exchange OK")


if __name__ == "__main__":
    main()
