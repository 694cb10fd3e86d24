"""Threshold / validated-subset decryption helpers.

The reference implements this flow only in example code
(``examples/pvw_valid_dec.rs:160-209``): external validation marks a subset
of dealer ciphertexts as valid; the protocol aborts if fewer than
``threshold`` are valid; every party decrypts only the valid subset,
preserving dealer indices for reconstruction. pvw-tpu promotes it to a
first-class library API — this is the scheme's only fault-tolerance story
(SURVEY.md §5, failure-detection row) and deserves more than an example.

The decrypt path is fully batched: the valid dealer columns are gathered
into one [k, s] ciphertext block, the inner products run as ONE device
contraction, and the sequential-rounding decode runs once over the whole
subset (on device by default — see pvw_tpu/crypto/device_decode.py). The
reference loops ``decrypt_party_value`` per dealer
(``pvw_valid_dec.rs:192-209``, rayon site P8).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np
import jax.numpy as jnp

from ..errors import InsufficientValidCiphertexts, InvalidParameters
from ..keys.secret_key import SecretKey
from ..ops import u64 as u64op
from .decryption import (
    _decode_batch,
    _decode_mode,
    _decrypt_decode_kernel,
    _decrypt_decode_kernel_ch,
    _decrypt_decode_subset_kernel,
    _decrypt_decode_subset_kernel_ch,
    _host_decrypt,
    _messages_from_device,
    _noisy_message_kernel,
    _noisy_message_kernel_ch,
)
from .encryption import PvwCiphertext


def _validate_indices(n: int, valid_dealer_indices: Sequence[int],
                      threshold: int) -> None:
    seen = set()
    for i in valid_dealer_indices:
        if not (0 <= i < n):
            raise InvalidParameters(f"dealer index {i} out of range 0..{n - 1}")
        if i in seen:
            raise InvalidParameters(f"duplicate dealer index {i}")
        seen.add(i)
    if len(valid_dealer_indices) < threshold:
        raise InsufficientValidCiphertexts(len(valid_dealer_indices), threshold)


def select_valid_ciphertexts(
    all_ciphertexts: Sequence[PvwCiphertext],
    valid_dealer_indices: Sequence[int],
    threshold: int,
) -> list[tuple[int, PvwCiphertext]]:
    """Filter to the externally-validated subset, aborting below threshold
    (``pvw_valid_dec.rs:160-195``). Returns (dealer_index, ciphertext)
    pairs so share reconstruction can track provenance."""
    _validate_indices(len(all_ciphertexts), valid_dealer_indices, threshold)
    return [(i, all_ciphertexts[i]) for i in valid_dealer_indices]


def decrypt_valid_shares(
    all_ciphertexts: Union[PvwCiphertext, Sequence[PvwCiphertext]],
    valid_dealer_indices: Sequence[int],
    threshold: int,
    secret_key: SecretKey,
    party_index: int,
) -> list[tuple[int, int]]:
    """Decrypt this party's share from each VALID dealer ciphertext
    (``pvw_valid_dec.rs:192-209``). Returns (dealer_index, share) pairs in
    the order given; raises :class:`InsufficientValidCiphertexts` below
    threshold.

    Accepts a list of n PvwCiphertexts (API parity) or one batched
    PvwCiphertext from ``encrypt_all_party_shares_batched``; either way
    the subset decrypts as ONE device program.
    """
    idx_list = list(valid_dealer_indices)

    if isinstance(all_ciphertexts, PvwCiphertext):
        ct = all_ciphertexts
        params = ct.params
        if len(ct.c1.batch_shape) != 2:
            raise InvalidParameters("expected a batched ciphertext")
        d = ct.c1.batch_shape[1]
        if d != params.n:
            raise InvalidParameters(f"Expected {params.n} ciphertexts, got {d}")
        if not (0 <= party_index < params.n):
            raise InvalidParameters(
                f"Party index {party_index} exceeds maximum {params.n - 1}"
            )
        _validate_indices(d, idx_list, threshold)
        sel = jnp.asarray(np.asarray(idx_list, np.int32))
        sk = secret_key.to_polynomials()
        if ct.c1.is_channel_major and ct.c2.is_channel_major:
            c1h, c1l = ct.c1.channel_pair()            # [L, l, k, d]
            c2h, c2l = ct.c2[party_index].channel_pair()  # [L, l, d]
            if _decode_mode(params, len(idx_list)) == "device":
                # ONE program: the subset gather fuses into the fused
                # decrypt-decode (separate take dispatches measured 1.7x
                # slower per share — BASELINE.md threshold row)
                out = _decrypt_decode_subset_kernel_ch(
                    params, sk.hi, sk.lo, c1h, c1l, c2h, c2l, sel)
                return list(zip(idx_list, _messages_from_device(out)))
            args = (params, sk.hi, sk.lo,
                    jnp.take(c1h, sel, axis=3), jnp.take(c1l, sel, axis=3),
                    jnp.take(c2h, sel, axis=2), jnp.take(c2l, sel, axis=2))
            kern, kern_dec = _noisy_message_kernel_ch, _decrypt_decode_kernel_ch
        else:
            c1h, c1l = ct.c1.pair                      # [k, d, L, l]
            c2h, c2l = ct.c2.hi[party_index], ct.c2.lo[party_index]
            if _decode_mode(params, len(idx_list)) == "device":
                out = _decrypt_decode_subset_kernel(
                    params, sk.hi, sk.lo, c1h, c1l, c2h, c2l, sel)
                return list(zip(idx_list, _messages_from_device(out)))
            args = (params, sk.hi, sk.lo,
                    jnp.take(c1h, sel, axis=1), jnp.take(c1l, sel, axis=1),
                    jnp.take(c2h, sel, axis=0), jnp.take(c2l, sel, axis=0))
            kern, kern_dec = _noisy_message_kernel, _decrypt_decode_kernel
    else:
        selected = select_valid_ciphertexts(
            all_ciphertexts, idx_list, threshold
        )
        params = selected[0][1].params
        if not (0 <= party_index < params.n):
            raise InvalidParameters(
                f"Party index {party_index} exceeds maximum {params.n - 1}"
            )
        sk = secret_key.to_polynomials()
        c1h = jnp.stack([ct.c1.hi for _, ct in selected], axis=1)
        c1l = jnp.stack([ct.c1.lo for _, ct in selected], axis=1)
        c2h = jnp.stack([ct.c2.hi[party_index] for _, ct in selected])
        c2l = jnp.stack([ct.c2.lo[party_index] for _, ct in selected])
        args = (params, sk.hi, sk.lo, c1h, c1l, c2h, c2l)
        kern, kern_dec = _noisy_message_kernel, _decrypt_decode_kernel

    mode = _decode_mode(params, len(idx_list))
    if mode == "host":
        c1h, c1l, c2h, c2l = args[3], args[4], args[5], args[6]
        if kern is _noisy_message_kernel_ch:
            # channel-major [L, l, k, s] / [L, l, s] -> canonical
            c1h = jnp.transpose(c1h, (2, 3, 0, 1))
            c1l = jnp.transpose(c1l, (2, 3, 0, 1))
            c2h = jnp.transpose(c2h, (2, 0, 1))
            c2l = jnp.transpose(c2l, (2, 0, 1))
        shares = _host_decrypt(params, secret_key, c1h, c1l, c2h, c2l)
    elif mode == "device":
        shares = _messages_from_device(kern_dec(*args))
    else:
        z = np.asarray(kern(*args))
        residues = u64op.join_u64_np(z[0], z[1])
        shares = _decode_batch(residues, params)
    return list(zip(idx_list, shares))
