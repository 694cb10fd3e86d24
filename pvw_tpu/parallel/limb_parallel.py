"""RNS limb-parallel encryption/decryption across devices.

The second scaling axis promised in SURVEY.md §5/§7 (after the
(recv, kdim) mesh of :mod:`pvw_tpu.parallel.sharding`): the RNS limbs of
every quantity in the scheme are INDEPENDENT — c1/c2 limb i is a function
of operand limb i only, and all randomness is drawn in coefficient space
(limb-independent streams) before being embedded per limb. Limb
parallelism therefore needs NO collectives at all during encryption: each
device runs the full fused kernel over its limb block with
limb-restricted parameters (:meth:`PvwParameters.restrict_limbs` — same
full-q gadget/Δ, sub-ring tables), and concatenating the limb axes is
bit-identical to the single-device run (tested).

This is deliberately MPMD-style (one jitted program per limb shard,
dispatched asynchronously to its device) rather than shard_map: the
kernels' fold/twiddle/gadget tables are per-limb compile-time constants,
so per-shard program specialization is both simpler and faster than
threading every table through as a sharded operand. Deep chains are where
this matters: the 128-bit-security configs carry 17 limbs, and encryption
cost is linear in the limb count.

Decryption: the device inner-product stage runs per limb shard the same
way; the host decode (CRT lift) needs all limbs and consumes the
concatenated residues.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..errors import InvalidParameters
from ..keys.public_key import GlobalPublicKey
from ..keys.secret_key import SecretKey
from ..params.parameters import PvwParameters
from ..poly import Poly, Representation
from ..crypto.encryption import (
    PvwCiphertext, _encrypt_kernel, _host_noise_pairs, _scalars_to_pairs,
)
from ..crypto.decryption import _decode_batch, _noisy_message_kernel_ch
from ..ops import u64 as u64op


def limb_partition(num_limbs: int, num_shards: int) -> list[tuple[int, ...]]:
    """Contiguous, balanced limb blocks (larger blocks first)."""
    if not 1 <= num_shards <= num_limbs:
        raise InvalidParameters(
            f"need 1 <= shards <= limbs, got {num_shards} > {num_limbs}"
        )
    base, extra = divmod(num_limbs, num_shards)
    out, start = [], 0
    for s in range(num_shards):
        size = base + (1 if s < extra else 0)
        out.append(tuple(range(start, start + size)))
        start += size
    return out


class LimbShardedCiphertext:
    """Per-device channel-major ciphertext limb shards.

    ``shards``: list of (c1_hi, c1_lo, c2_hi, c2_lo) channel-major arrays
    ([L_s, l, k, d] / [L_s, l, n, d]), one per limb block, resident on
    their respective devices. ``gather()`` concatenates the limb axes into
    a regular :class:`PvwCiphertext` (bit-identical to the single-device
    kernel output for the same key).
    """

    def __init__(self, shards, partition, params: PvwParameters) -> None:
        self.shards = shards
        self.partition = partition
        self.params = params

    def gather(self) -> PvwCiphertext:
        dev0 = next(iter(self.shards[0][0].devices()))
        cat = lambda j: jnp.concatenate(
            [jax.device_put(s[j], dev0) for s in self.shards], axis=0
        )
        c1h, c1l, c2h, c2l = cat(0), cat(1), cat(2), cat(3)
        ring = self.params.ring
        return PvwCiphertext(
            Poly.from_channel_major(c1h, c1l, Representation.Ntt, ring),
            Poly.from_channel_major(c2h, c2l, Representation.Ntt, ring),
            self.params,
        )


def _shard_operands(global_pk: GlobalPublicKey, partition, devices):
    """Per-shard (sub_params, a_dig, b_dig) with the channel-major digit
    planes limb-sliced and placed on each shard's device."""
    params = global_pk.params
    a_dig, b_dig = global_pk.encrypt_operands()
    out = []
    for idx, dev in zip(partition, devices):
        sub = params.restrict_limbs(idx)
        lo, hi = idx[0], idx[-1] + 1
        out.append((
            sub,
            jax.device_put(a_dig[lo:hi], dev),
            jax.device_put(b_dig[lo:hi], dev),
        ))
    return out


def encrypt_batch_limb_parallel(all_scalars, global_pk: GlobalPublicKey,
                                key: jax.Array,
                                devices=None) -> LimbShardedCiphertext:
    """d-batched PVW encryption with the RNS limb axis split across
    devices — zero collectives; each device runs the fused kernel over its
    limb block. Bit-identical to :func:`pvw_tpu.crypto.encrypt_batch`
    under the same key (the coefficient-space randomness streams are
    limb-independent)."""
    params = global_pk.params
    devices = list(devices if devices is not None else jax.devices())
    shards = min(len(devices), params.ring.num_limbs)
    devices = devices[:shards]
    partition = limb_partition(params.ring.num_limbs, shards)

    arr = np.asarray(all_scalars, np.uint64)
    if arr.ndim != 2 or arr.shape[1] != params.n:
        raise InvalidParameters(
            f"Must provide [d, n={params.n}] scalars, got {arr.shape}"
        )
    if not global_pk.is_full():
        raise InvalidParameters(
            "Global public key is not complete (missing party keys)"
        )
    if not params.verify_correctness_condition():
        raise InvalidParameters(
            "Parameters do not satisfy correctness condition - decryption "
            "may fail"
        )
    sc_hi, sc_lo = _scalars_to_pairs(arr)
    encode32 = not bool(np.any(arr >> np.uint64(32)))

    results = []
    for (sub, a_dig, b_dig), dev in zip(
        _shard_operands(global_pk, partition, devices), devices
    ):
        sch = jax.device_put(sc_hi, dev)
        scl = jax.device_put(sc_lo, dev)
        k_dev = jax.device_put(key, dev)
        # bounds >= min(q_i): exact host sampling per limb shard. The
        # host stream depends only on the key (not the ring), so every
        # shard's residues are reductions of the SAME sampled integers —
        # the limb concatenation stays bit-identical to the full-ring
        # draw (encryption._host_noise_pairs).
        he1, he2 = _host_noise_pairs(sub, key, arr.shape[0],
                                     min_q=min(params.ring.moduli))
        # async dispatch: all devices run concurrently
        from ..config import settings

        results.append(_encrypt_kernel(sub, a_dig, b_dig, sch, scl,
                                       k_dev, encode32, he1, he2,
                                       settings.kernel_noise_stream()))
    return LimbShardedCiphertext(results, partition, params)


def decrypt_party_shares_limb_parallel(ct: LimbShardedCiphertext,
                                       secret_key: SecretKey,
                                       party_index: int) -> list[int]:
    """Batched decryption of a limb-sharded ciphertext: the device
    inner-product stage runs per limb shard (no collectives — limbs are
    independent through the inverse NTT), then the limb residues gather
    onto the first shard's device where the multiword sequential-rounding
    decode runs as ONE device program (:mod:`pvw_tpu.crypto.
    device_decode`; the decode needs every limb for its CRT lifts, so it
    cannot stay limb-local). Host fetch = 8 B/msg, same as the
    single-device path. ``PVW_TPU_DECODE=native|python`` falls back to
    the host engines on the gathered residues."""
    from ..crypto.decryption import _decode_mode, _messages_from_device
    from ..crypto import device_decode

    params = ct.params
    if not (0 <= party_index < params.n):
        raise InvalidParameters(
            f"Party index {party_index} exceeds maximum {params.n - 1}"
        )
    sk = secret_key.to_polynomials()
    zs = []
    for (c1h, c1l, c2h, c2l), idx in zip(ct.shards, ct.partition):
        sub = params.restrict_limbs(idx)
        dev = c1h.devices().pop()
        lo, hi = idx[0], idx[-1] + 1
        skh = jax.device_put(sk.hi[:, lo:hi], dev)
        skl = jax.device_put(sk.lo[:, lo:hi], dev)
        zs.append(_noisy_message_kernel_ch(
            sub, skh, skl, c1h, c1l, c2h[:, :, party_index],
            c2l[:, :, party_index],
        ))
    if _decode_mode(params, d=None) == "device":
        # gather limb residues onto shard 0's device and decode there:
        # [2, d, L_s, l] blocks -> [2, d, L, l] -> messages [2, d]
        dev0 = next(iter(zs[0].devices()))
        z = jnp.concatenate([jax.device_put(zz, dev0) for zz in zs], axis=2)
        plan = device_decode.get_plan(params)
        return _messages_from_device(
            device_decode.decode_residues_jit(plan, z[0], z[1]))
    # concat limb axes on host: [2, d, L_s, l] -> [2, d, L, l]
    z = np.concatenate([np.asarray(zz) for zz in zs], axis=2)
    residues = u64op.join_u64_np(z[0], z[1])
    return _decode_batch(residues, params)
