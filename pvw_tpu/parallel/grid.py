"""Grid parallelism: BOTH scaling axes at once — RNS limb groups (outer,
zero collectives) x the (recv, kdim) mesh (inner, ICI collectives).

SURVEY.md §5's north star partitions "receivers and limbs across chips";
:mod:`pvw_tpu.parallel.sharding` and :mod:`pvw_tpu.parallel.limb_parallel`
each cover one axis. This module composes them: the device set splits into
``limb_groups`` equal subsets, each subset runs the mesh-sharded
encryption kernel over its limb block with limb-restricted parameters
(full-q gadget/Δ — :meth:`PvwParameters.restrict_limbs`), and the limb
axes concatenate bit-identically to the single-device kernel (limbs are
independent throughout the scheme and all randomness is drawn in
coefficient space). A 3-axis deployment (limb x recv x kdim) maps a
17-limb 128-bit-security config across a pod without any cross-limb
traffic: collectives stay INSIDE each limb group's mesh (ICI-local when
groups align with pod topology), exactly the layout SURVEY §5 plans.

Like limb_parallel, the outer axis is MPMD-style (one jitted program per
limb group, dispatched asynchronously); the inner axis is SPMD shard_map.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import InvalidParameters
from ..keys.public_key import GlobalPublicKey
from ..keys.secret_key import SecretKey
from ..params.parameters import PvwParameters
from ..poly import Poly, Representation
from ..crypto.encryption import (
    PvwCiphertext, _host_noise_pairs, _scalars_to_pairs,
)
from ..crypto.decryption import _decode_batch, _messages_from_device
from ..ops import u64 as u64op
from .limb_parallel import limb_partition
from .sharding import _encrypt_kernel_sharded, _noisy_sharded, make_mesh


class GridShardedCiphertext:
    """Per-limb-group CANONICAL-layout ciphertext shards.

    ``shards``: list of (c1_hi, c1_lo, c2_hi, c2_lo) canonical arrays
    ([k, d, L_g, l] / [n, d, L_g, l]), one per limb group, mesh-sharded
    within the group. ``gather()`` concatenates the limb axes into a
    regular :class:`PvwCiphertext`."""

    def __init__(self, shards, partition, meshes,
                 params: PvwParameters) -> None:
        self.shards = shards
        self.partition = partition
        self.meshes = meshes
        self.params = params

    def gather(self) -> PvwCiphertext:
        cat = lambda j: jnp.concatenate(
            [np.asarray(s[j]) for s in self.shards], axis=2)
        return PvwCiphertext(
            Poly(cat(0), cat(1), Representation.Ntt, self.params.ring),
            Poly(cat(2), cat(3), Representation.Ntt, self.params.ring),
            self.params,
        )


def _device_groups(devices, limb_groups: int):
    if len(devices) % limb_groups:
        raise InvalidParameters(
            f"{len(devices)} devices not divisible into {limb_groups} "
            "limb groups")
    per = len(devices) // limb_groups
    return [devices[g * per:(g + 1) * per] for g in range(limb_groups)]


def encrypt_batch_grid(all_scalars, global_pk: GlobalPublicKey,
                       key: jax.Array, devices=None, limb_groups: int = 2,
                       kdim: int | None = None) -> GridShardedCiphertext:
    """d-batched PVW encryption over the (limb x recv x kdim) grid —
    bit-identical to :func:`pvw_tpu.crypto.encrypt_batch` under the same
    key (tested). Each limb group's kernel runs concurrently (async
    dispatch) on its own (recv, kdim) mesh."""
    params = global_pk.params
    devices = list(devices if devices is not None else jax.devices())
    if not 1 <= limb_groups <= params.ring.num_limbs:
        raise InvalidParameters(
            f"need 1 <= limb_groups <= {params.ring.num_limbs}")
    groups = _device_groups(devices, limb_groups)
    partition = limb_partition(params.ring.num_limbs, limb_groups)

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
    sc_hi, sc_lo = _scalars_to_pairs(arr)
    a_dig, b_dig = global_pk.encrypt_operands()
    min_q = min(params.ring.moduli)
    to_canon = lambda p: (jnp.transpose(p[0], (2, 3, 0, 1)),
                          jnp.transpose(p[1], (2, 3, 0, 1)))

    shards, meshes = [], []
    for idx, devs in zip(partition, groups):
        sub = params.restrict_limbs(idx)
        lo, hi = idx[0], idx[-1] + 1
        mesh = make_mesh(devs, kdim=kdim)
        nr, kd = mesh.shape["recv"], mesh.shape["kdim"]
        if params.n % nr or params.k % kd:
            raise InvalidParameters(
                f"n={params.n} must divide over recv={nr} and "
                f"k={params.k} over kdim={kd}")
        # bounds >= min(q_i of the FULL ring): exact host sampling, same
        # values on every limb group (the host stream is ring-independent)
        he1, he2 = _host_noise_pairs(sub, key, arr.shape[0], min_q=min_q)
        from ..config import settings

        shards.append(_encrypt_kernel_sharded(
            sub, mesh, a_dig[lo:hi], b_dig[lo:hi], sc_hi, sc_lo, key,
            to_canon(he1) if he1 is not None else None,
            to_canon(he2) if he2 is not None else None,
            False, settings.kernel_noise_stream(),
        ))
        meshes.append(mesh)
    return GridShardedCiphertext(shards, partition, meshes, params)


def decrypt_party_shares_grid(ct: GridShardedCiphertext,
                              secret_key: SecretKey,
                              party_index: int) -> list[int]:
    """Batched decryption over the grid: each limb group runs the
    mesh-sharded inner-product stage (dealers over recv, contraction over
    kdim), then the limb residues gather for the decode (the CRT lifts
    need every limb). Ref: ``decryption.rs:281-325`` (rayon site P8)."""
    from ..crypto import device_decode
    from ..crypto.decryption import _decode_mode

    params = ct.params
    if not (0 <= party_index < params.n):
        raise InvalidParameters(
            f"Party index {party_index} exceeds maximum {params.n - 1}")
    sk = secret_key.to_polynomials()
    zs = []
    for (c1h, c1l, c2h, c2l), idx, mesh in zip(
            ct.shards, ct.partition, ct.meshes):
        sub = params.restrict_limbs(idx)
        lo, hi = idx[0], idx[-1] + 1
        zh, zl = _noisy_sharded(
            sub, mesh, False, sk.hi[:, lo:hi], sk.lo[:, lo:hi],
            c1h, c1l, c2h[party_index], c2l[party_index],
        )                                           # [d, L_g, l]
        zs.append((zh, zl))
    if _decode_mode(params, d=None) == "device":
        zh = jnp.concatenate([np.asarray(z[0]) for z in zs], axis=1)
        zl = jnp.concatenate([np.asarray(z[1]) for z in zs], axis=1)
        plan = device_decode.get_plan(params)
        return _messages_from_device(
            device_decode.decode_residues_jit(plan, zh, zl))
    z_hi = np.concatenate([np.asarray(z[0]) for z in zs], axis=1)
    z_lo = np.concatenate([np.asarray(z[1]) for z in zs], axis=1)
    residues = u64op.join_u64_np(z_hi, z_lo)
    return _decode_batch(residues, params)
