"""Threshold / validated-subset decryption helpers.

The reference implements this flow only in example code
(``examples/pvw_valid_dec.rs:160-209``): external validation marks a subset
of dealer ciphertexts as valid; the protocol aborts if fewer than
``threshold`` are valid; every party decrypts only the valid subset,
preserving dealer indices for reconstruction. pvw-tpu promotes it to a
first-class library API — this is the scheme's only fault-tolerance story
(SURVEY.md §5, failure-detection row) and deserves more than an example.
"""

from __future__ import annotations

from typing import Sequence

from ..errors import InsufficientValidCiphertexts, InvalidParameters
from ..keys.secret_key import SecretKey
from .decryption import decrypt_party_value
from .encryption import PvwCiphertext


def select_valid_ciphertexts(
    all_ciphertexts: Sequence[PvwCiphertext],
    valid_dealer_indices: Sequence[int],
    threshold: int,
) -> list[tuple[int, PvwCiphertext]]:
    """Filter to the externally-validated subset, aborting below threshold
    (``pvw_valid_dec.rs:160-195``). Returns (dealer_index, ciphertext)
    pairs so share reconstruction can track provenance."""
    n = len(all_ciphertexts)
    seen = set()
    for i in valid_dealer_indices:
        if not (0 <= i < n):
            raise InvalidParameters(f"dealer index {i} out of range 0..{n - 1}")
        if i in seen:
            raise InvalidParameters(f"duplicate dealer index {i}")
        seen.add(i)
    if len(valid_dealer_indices) < threshold:
        raise InsufficientValidCiphertexts(len(valid_dealer_indices), threshold)
    return [(i, all_ciphertexts[i]) for i in valid_dealer_indices]


def decrypt_valid_shares(
    all_ciphertexts: Sequence[PvwCiphertext],
    valid_dealer_indices: Sequence[int],
    threshold: int,
    secret_key: SecretKey,
    party_index: int,
) -> list[tuple[int, int]]:
    """Decrypt this party's share from each VALID dealer ciphertext
    (``pvw_valid_dec.rs:192-209``). Returns (dealer_index, share) pairs;
    raises :class:`InsufficientValidCiphertexts` below threshold."""
    selected = select_valid_ciphertexts(
        all_ciphertexts, valid_dealer_indices, threshold
    )
    return [
        (dealer_idx, decrypt_party_value(ct, secret_key, party_index))
        for dealer_idx, ct in selected
    ]
