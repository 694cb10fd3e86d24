"""Multi-chip mesh sharding (TPU-native; no reference analogue)."""
from .sharding import (
    make_mesh,
    encrypt_batch_sharded,
    decrypt_party_shares_sharded,
)

__all__ = ["make_mesh", "encrypt_batch_sharded", "decrypt_party_shares_sharded"]
