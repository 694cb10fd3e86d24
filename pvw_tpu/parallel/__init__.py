"""Multi-chip parallelism (TPU-native; no reference analogue).

Two orthogonal scaling axes:

- :mod:`.sharding` — a (recv, kdim) ``jax.sharding.Mesh``: receivers
  row-sharded, the k contraction column-split with gather+modular-reduce
  collectives;
- :mod:`.limb_parallel` — the RNS limb axis split across devices with
  per-shard limb-restricted programs and ZERO collectives (limbs are
  independent throughout the scheme).
"""
from .sharding import (
    make_mesh,
    encrypt_batch_sharded,
    decrypt_party_shares_sharded,
)
from .limb_parallel import (
    LimbShardedCiphertext,
    decrypt_party_shares_limb_parallel,
    encrypt_batch_limb_parallel,
    limb_partition,
)

__all__ = [
    "make_mesh",
    "encrypt_batch_sharded",
    "decrypt_party_shares_sharded",
    "LimbShardedCiphertext",
    "decrypt_party_shares_limb_parallel",
    "encrypt_batch_limb_parallel",
    "limb_partition",
]
