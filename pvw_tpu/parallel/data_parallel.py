"""Dealer-batch DATA-PARALLEL encryption: the throughput-scaling backend.

The round-5 scaling projection (`benchmarks/project_scaling.py`,
BASELINE.md) shows why this backend exists: receiver/kdim meshes
duplicate the per-encryption r-stage (and c1) on every shard, capping
projected multi-chip efficiency at 76% for 2 devices and ~37% at 8 at
the n=8192 shape, and kdim's partial-sum gathers are ICI-heavy. The
dealer (batch) axis has none of that structure: each device encrypts its
own block of dealer rows with the UNMODIFIED single-chip kernel — zero
collectives, the B matrix replicated (134 MB at the headline, trivially
HBM-resident) — so throughput scales at ~100% projected efficiency.
This is the production answer for "more encryptions per second"; the
(recv, kdim) mesh, limb-parallel, and grid backends remain for when B
or the RNS chain itself cannot fit one device.

Bit-identity: under ``noise_stream="v3k"`` with both error bounds in the
signed-digit range, the shard outputs concatenate to EXACTLY the
single-device full-batch ciphertext — the v3k counters are global
(row, column, coefficient) coordinates, and each shard passes its
global dealer-column offset into the kernel, so it draws precisely the
columns the full batch would (the ONLY stream that can be split over
the batch axis bit-exactly: v3's jax.random counter layout depends on
the draw shape, and v4's stream on the tile grid). EVERY other
configuration — v3/v4 streams, or v3k with residue-path bounds — uses an
independent ``fold_in``-derived key per shard: still secure and
deterministic, but shard-layout-dependent (reusing one key there would
repeat the r randomness across shards, leaking message differences —
see the in-code SECURITY note). Huge bounds (>= min q_i, the sequential
host stream) are refused rather than silently changing the stream.

Ref: rayon site P6 (``encryption.rs:277-283``) is the reference's own
dealer-axis parallelism — this is its multi-chip form.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import InvalidParameters
from ..keys.public_key import GlobalPublicKey
from ..poly import Poly, Representation
from ..crypto.encryption import (
    PvwCiphertext, _encrypt_kernel, _host_noise_pairs, _scalars_to_pairs,
)


class DealerShardedCiphertext:
    """Per-device dealer-block ciphertexts; ``gather()`` concatenates to
    one batched :class:`PvwCiphertext` (c1 [k, d], c2 [n, d])."""

    def __init__(self, shards, offsets, params):
        self.shards = shards            # [(c1h, c1l, c2h, c2l)] channel-major
        self.offsets = offsets          # global dealer offset per shard
        self.params = params

    def gather(self) -> PvwCiphertext:
        dev = jax.devices()[0]
        parts = [[jax.device_put(x, dev) for x in s] for s in self.shards]
        c1h = jnp.concatenate([s[0] for s in parts], axis=3)
        c1l = jnp.concatenate([s[1] for s in parts], axis=3)
        c2h = jnp.concatenate([s[2] for s in parts], axis=3)
        c2l = jnp.concatenate([s[3] for s in parts], axis=3)
        ring = self.params.ring
        return PvwCiphertext(
            Poly.from_channel_major(c1h, c1l, Representation.Ntt, ring),
            Poly.from_channel_major(c2h, c2l, Representation.Ntt, ring),
            self.params,
        )


def encrypt_batch_data_parallel(all_scalars, global_pk: GlobalPublicKey,
                                key: jax.Array,
                                devices=None) -> DealerShardedCiphertext:
    """d-batched PVW encryption with the DEALER axis split across
    devices — each device runs the unmodified fused kernel on its dealer
    block with its global column offset threaded into the noise seeds.
    Zero collectives; ~100% projected scaling (see module docstring).
    Bit-identical to :func:`pvw_tpu.crypto.encrypt_batch` under
    ``noise_stream="v3k"``."""
    from ..config import settings

    params = global_pk.params
    devices = list(devices if devices is not None else jax.devices())
    arr = np.asarray(all_scalars, np.uint64)
    if arr.ndim != 2 or arr.shape[1] != params.n:
        raise InvalidParameters(
            f"Must provide [d, n={params.n}] scalars, got {arr.shape}")
    if not global_pk.is_full():
        raise InvalidParameters(
            "Global public key is not complete (missing party keys)")
    if not params.verify_correctness_condition():
        raise InvalidParameters(
            "Parameters do not satisfy correctness condition - decryption "
            "may fail")
    d = arr.shape[0]
    nshards = min(len(devices), d)
    devices = devices[:nshards]
    if _host_noise_pairs(params, key, 1)[0] is not None:
        raise InvalidParameters(
            "data-parallel encryption does not support error bounds >= "
            "the smallest modulus (the exact host stream is sequential "
            "over the full batch); use encrypt_batch or the mesh backends")
    # block partition (ragged tail allowed)
    base, rem = divmod(d, nshards)
    sizes = [base + (1 if i < rem else 0) for i in range(nshards)]
    offsets = list(np.cumsum([0] + sizes[:-1]))
    sc_hi, sc_lo = _scalars_to_pairs(arr)
    encode32 = not bool(np.any(arr >> np.uint64(32)))
    a_dig, b_dig = global_pk.encrypt_operands()
    stream = settings.kernel_noise_stream()
    # SECURITY: the exact global-counter contract (every shard drawing
    # the columns the full batch would) holds ONLY when both the noise
    # and the r stream are column-global — i.e. v3k with both bounds in
    # the signed-digit range. Outside it, v3/v4 streams ignore the
    # column offset, and passing the SAME key to every shard would
    # REUSE the encryption randomness r across shards: two dealers at
    # the same local column would then differ only by noise (on the XLA
    # path c2_a - c2_b = encode(m_a - m_b) exactly) — a message-
    # difference leak. Those streams get an independent per-shard key
    # instead: secure and deterministic, but shard-layout-dependent
    # (documented; the bit-identity contract is v3k-only).
    from ..ops.ntt import signed_digit_count

    exact = (stream == "v3k"
             and signed_digit_count(params.error_bound_1) > 0
             and signed_digit_count(params.error_bound_2) > 0)

    shards = []
    for idx, (off, sz, dev) in enumerate(zip(offsets, sizes, devices)):
        shard_key = key if exact else jax.random.fold_in(key, 1_000_003 + idx)
        shards.append(_encrypt_kernel(
            params,
            jax.device_put(a_dig, dev), jax.device_put(b_dig, dev),
            jax.device_put(sc_hi[off:off + sz], dev),
            jax.device_put(sc_lo[off:off + sz], dev),
            jax.device_put(shard_key, dev), encode32, None, None, stream,
            int(off) if exact else 0,
        ))
    return DealerShardedCiphertext(shards, offsets, params)
