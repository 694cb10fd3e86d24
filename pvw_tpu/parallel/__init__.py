"""Multi-chip parallelism (TPU-native; no reference analogue).

Two orthogonal scaling axes:

- :mod:`.sharding` — a (recv, kdim) ``jax.sharding.Mesh``: receivers
  row-sharded, the k contraction column-split with gather+modular-reduce
  collectives;
- :mod:`.limb_parallel` — the RNS limb axis split across devices with
  per-shard limb-restricted programs and ZERO collectives (limbs are
  independent throughout the scheme);
- :mod:`.grid` — BOTH at once: limb groups (outer, MPMD) x the
  (recv, kdim) mesh (inner, SPMD) — the 3-axis pod layout of SURVEY §5;
- :mod:`.multiprocess` — the mesh spanning real ``jax.distributed``
  process boundaries (DCN-style), with per-shard bit-identity checks;
- :mod:`.data_parallel` — the DEALER (batch) axis split across devices
  with zero collectives (round 5): the throughput-scaling backend
  (~100% projected efficiency — benchmarks/project_scaling.py), bit-
  identical to single-device under the v3k stream.
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
from .grid import (
    GridShardedCiphertext,
    decrypt_party_shares_grid,
    encrypt_batch_grid,
)
from .data_parallel import (
    DealerShardedCiphertext,
    encrypt_batch_data_parallel,
)

__all__ = [
    "DealerShardedCiphertext",
    "encrypt_batch_data_parallel",
    "make_mesh",
    "encrypt_batch_sharded",
    "decrypt_party_shares_sharded",
    "LimbShardedCiphertext",
    "decrypt_party_shares_limb_parallel",
    "encrypt_batch_limb_parallel",
    "GridShardedCiphertext",
    "decrypt_party_shares_grid",
    "encrypt_batch_grid",
    "limb_partition",
]
