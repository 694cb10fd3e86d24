"""Projected multi-chip scaling from MEASURED shard programs + an
analytic ICI model (round 5).

The BASELINE.json north star asks for >= 80% multi-host scaling
efficiency at n=8192 — unmeasurable here (one physical chip). What IS
measurable is every ingredient the projection needs:

- t_shard(recv, kdim): the wall time of ONE shard's actual compute —
  the r-stage over its k-block (kdim splits the CBD+NTT+prescale by
  row-keyed sampling), the c1 partial over (k, kc), and the c2 partial
  over (n/recv, kc) with in-kernel noise+encode — run as a standalone
  jitted program on the real chip with the production kernels and tiles;
- comm(recv, kdim): the kdim all_gather + modular-reduce bytes (c1
  [k, d] pairs replicated across kdim, c2 [n/recv, d] pairs gathered
  kdim-wise), charged at v5e ICI ~45 GB/s per link, plus the local
  addmod (measured separately to be negligible vs the kernels).

projected efficiency(N devices) = t_full / (N * (t_shard + t_comm)).

This makes the scaling STRUCTURE visible: recv-only sharding duplicates
the full r-stage and c1 on every shard (efficiency decays toward
t_rstage/t_full as recv grows), while (recv, kdim) meshes split the
r-stage too at the cost of one gather — the mesh shape the parallel/
module defaults to. Numbers land in BASELINE.md; this is a MODEL, and
is labeled as such wherever quoted.

Usage: python benchmarks/project_scaling.py [n] [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
D = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
K, ELL = 256, 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)
ICI_BYTES_PER_S = 45e9          # per-direction per-link, v5e class


def main():
    from pvw_tpu import GlobalPublicKey, PvwCrs, PvwParameters, \
        PvwParametersBuilder
    from pvw_tpu.crypto.encryption import _scalars_to_pairs
    from pvw_tpu.ops import modmat, ntt as ntt_ops
    from pvw_tpu.ops.pallas_modmat import (
        encode_tab, kernel_noise_available, matmul_fold_scaled,
    )
    from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd, \
        sample_vec_cbd_rows

    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    coeffs = sample_vec_cbd(jax.random.fold_in(key, 10_000),
                            (N, K, ELL), 0.5)
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_keys_device(coeffs, jax.random.fold_in(key, 1))
    a_dig, b_dig = gpk.encrypt_operands()
    rng = np.random.default_rng(0)
    scalars = rng.integers(0, 1 << 32, (D, N), np.uint64)
    sc_hi, sc_lo = _scalars_to_pairs(scalars)
    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli))
    r_bound = cbd_bound(0.5)
    assert kernel_noise_available(ring, N, D, K, params.error_bound_2)

    def shard_step(recv: int, kdim: int):
        """One shard's compute for the (recv, kdim) mesh, as the
        production kernels run it (v4 noise, in-kernel encode; shard 0's
        blocks — all shards are the same shapes)."""
        nl, kc = N // recv, K // kdim
        nd = ring.num_digits
        b_blk = b_dig[:, :, :nl, : kc * nd]
        a_blk = a_dig[:, :, :, : kc * nd]
        enc = (jnp.transpose(sc_hi[:, :nl]), jnp.transpose(sc_lo[:, :nl]),
               etab)
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(jax.random.fold_in(key, 9)).reshape(2),
            jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        jr1 = ntt_ops.signed_digit_count(params.error_bound_1)
        jr2 = ntt_ops.signed_digit_count(params.error_bound_2)

        @jax.jit
        def step(kk):
            rc = sample_vec_cbd_rows(kk, 0, kc, (D, ELL), 0.5)
            rb = ntt_ops.ntt_forward_signed_ch(rc, ring, r_bound)
            r_op = modmat.prescale_digits_band(rb, ring)
            c1 = matmul_fold_scaled(
                None, r_op, ring, lhs_dig=a_blk,
                gen_noise=(seeds, jr1, int(params.error_bound_1)))
            c2 = matmul_fold_scaled(
                None, r_op, ring, lhs_dig=b_blk, encode=enc,
                gen_noise=(seeds, jr2, int(params.error_bound_2)))
            return c1, c2

        return step

    def timeit(step, reps=10):
        out = step(jax.random.fold_in(key, 1000))
        _ = np.asarray(out[0][0][(0,) * out[0][0].ndim])
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(jax.random.fold_in(key, 1001 + i))
        _ = np.asarray(out[0][0][(0,) * out[0][0].ndim])
        return (time.perf_counter() - t0) / reps

    t_full = timeit(shard_step(1, 1))
    print(f"n={N} k={K} batch={D}: full single-chip step "
          f"{t_full * 1e3:.1f} ms ({D / t_full:.0f} enc/s)", flush=True)

    # comm model: kdim all_gather of the c1 partial [K, D] and the c2
    # partial [N/recv, D] residue PAIRS (2 x u32 hi/lo = 8 B/residue
    # element x L x l), ring algorithm: (kdim-1)/kdim of the data
    # crosses each link
    elem_bytes = 8 * ring.num_limbs * ring.degree

    def comm_s(recv, kdim):
        if kdim == 1:
            return 0.0
        payload = (K * D + (N // recv) * D) * elem_bytes
        return payload * (kdim - 1) / kdim / ICI_BYTES_PER_S

    rows = []
    for recv, kdim in ((2, 1), (4, 1), (8, 1), (2, 2), (4, 2), (2, 4)):
        nd_dev = recv * kdim
        t_sh = timeit(shard_step(recv, kdim))
        t_comm = comm_s(recv, kdim)
        eff = t_full / (nd_dev * (t_sh + t_comm))
        rows.append((recv, kdim, t_sh, t_comm, eff))
        print(f"mesh (recv={recv}, kdim={kdim}) -> {nd_dev} devices: "
              f"shard {t_sh * 1e3:.1f} ms + comm {t_comm * 1e3:.1f} ms "
              f"(model) => projected efficiency {eff * 100:.0f}%, "
              f"projected {nd_dev * D / (t_sh + t_comm):.0f} enc/s",
              flush=True)

    # dealer-batch DATA-PARALLEL (parallel/data_parallel.py): each device
    # runs the FULL single-chip kernel on d/N dealers — zero collectives;
    # the only efficiency loss is the smaller per-device batch
    def dp_step(dl: int):
        nd = ring.num_digits
        enc = (jnp.transpose(sc_hi[:dl]), jnp.transpose(sc_lo[:dl]), etab)
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(jax.random.fold_in(key, 9)).reshape(2),
            jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        jr1 = ntt_ops.signed_digit_count(params.error_bound_1)
        jr2 = ntt_ops.signed_digit_count(params.error_bound_2)

        @jax.jit
        def step(kk):
            rc = sample_vec_cbd_rows(kk, 0, K, (dl, ELL), 0.5)
            rb = ntt_ops.ntt_forward_signed_ch(rc, ring, r_bound)
            r_op = modmat.prescale_digits_band(rb, ring)
            c1 = matmul_fold_scaled(
                None, r_op, ring, lhs_dig=a_dig,
                gen_noise=(seeds, jr1, int(params.error_bound_1)))
            c2 = matmul_fold_scaled(
                None, r_op, ring, lhs_dig=b_dig, encode=enc,
                gen_noise=(seeds, jr2, int(params.error_bound_2)))
            return c1, c2

        return step

    for nd_dev in (2, 4, 8):
        dl = D // nd_dev
        t_sh = timeit(dp_step(dl))
        eff = t_full / (nd_dev * t_sh)
        print(f"data-parallel -> {nd_dev} devices (d={dl}/device): "
              f"shard {t_sh * 1e3:.1f} ms, ZERO comm => projected "
              f"efficiency {eff * 100:.0f}%, projected "
              f"{nd_dev * dl / t_sh:.0f} enc/s", flush=True)


if __name__ == "__main__":
    main()
