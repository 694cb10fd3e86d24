"""Protocol operations (mirrors ``/root/reference/src/crypto/mod.rs``)."""
from .encryption import (
    PvwCiphertext,
    encrypt,
    encrypt_batch,
    encrypt_party_shares,
    encrypt_all_party_shares,
    encrypt_all_party_shares_batched,
    encrypt_broadcast,
)
from .decryption import (
    decode_scalar_pvw_rns,
    decrypt_party_value,
    decrypt_party_shares,
)
from .threshold import select_valid_ciphertexts, decrypt_valid_shares

__all__ = [
    "PvwCiphertext", "encrypt", "encrypt_batch", "encrypt_party_shares",
    "encrypt_all_party_shares", "encrypt_all_party_shares_batched",
    "encrypt_broadcast", "decode_scalar_pvw_rns", "decrypt_party_value",
    "decrypt_party_shares", "select_valid_ciphertexts", "decrypt_valid_shares",
]
