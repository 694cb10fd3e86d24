"""Multi-PROCESS mesh execution: the (recv, kdim) mesh spanning real
process boundaries via ``jax.distributed`` (DCN-style), with encrypt and
decrypt bit-identity asserted against the single-process kernels.

The single-process shard_map tests (tests/test_sharding.py, the
``dryrun_multichip`` virtual mesh) prove the SPMD program is correct under
one controller; this module is the other leg of the multi-host north star
(BASELINE.json): every collective — the ``all_gather`` + modular-reduce
over ``kdim``, the replication of c1 — actually crosses process
boundaries (Gloo on the CPU backend; the same program rides ICI/DCN on a
real TPU pod). Because all randomness is counter-based, each process can
compute the full expected result locally and verify exactly the shards it
owns: no cross-process result shipping is needed for the assertion.

Two entry points:

- :func:`run_worker` — executed by EACH spawned process (via
  ``python -m pvw_tpu.parallel.multiprocess <pid> <nproc> <port> <ldev>``);
- :func:`dryrun_multiprocess` — the launcher: spawns the workers, waits,
  and raises unless every process verified its shards.
"""

from __future__ import annotations

import os
import subprocess
import sys

OK_MARKER = "MULTIPROC-OK"


def run_worker(process_id: int, num_processes: int, port: int,
               local_devices: int) -> None:
    """One process of the multi-process dryrun (see module docstring)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from pvw_tpu import (
        GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    )
    from pvw_tpu.crypto import device_decode
    from pvw_tpu.crypto.encryption import encrypt_batch, _scalars_to_pairs
    from pvw_tpu.parallel.sharding import (
        _encrypt_kernel_sharded, _noisy_sharded,
    )

    assert jax.device_count() == num_processes * local_devices
    assert jax.local_device_count() == local_devices

    # -- deterministic system, built identically by every process --------
    # non-toy config, matching the hardened dryrun family: the reference's
    # 4x55-bit chain (examples/pvw_valid_dec.rs:40-45), 221-bit q
    moduli = (0x80000000080001, 0x80000000130001,
              0x80000000190001, 0x800000001D0001)
    n = k = 32
    d = 8
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, 8, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
              .set_l(8).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))

    vectors = np.array(
        [[dd * 10 + r + 1 for r in range(n)] for dd in range(d)], np.uint64
    )
    enc_key = jax.random.fold_in(key, 5)

    # local single-device reference (identical on every process)
    ct_ref = encrypt_batch(vectors, gpk, enc_key)
    ref_c1h = np.asarray(ct_ref.c1.hi)      # [k, d, L, l] (canonicalizes)
    ref_c1l = np.asarray(ct_ref.c1.lo)
    ref_c2h = np.asarray(ct_ref.c2.hi)      # [n, d, L, l]
    ref_c2l = np.asarray(ct_ref.c2.lo)

    # -- global mesh spanning the processes ------------------------------
    total = num_processes * local_devices
    kdim = 2
    mesh = Mesh(np.array(jax.devices()).reshape(total // kdim, kdim),
                ("recv", "kdim"))

    def place(np_val, spec):
        arr = np.asarray(np_val)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    a_dig, b_dig = gpk.encrypt_operands()
    sc_hi, sc_lo = _scalars_to_pairs(vectors)
    g_a = place(a_dig, P(None, None, None, "kdim"))
    g_b = place(b_dig, P(None, None, "recv", "kdim"))
    g_sh = place(sc_hi, P(None, "recv"))
    g_sl = place(sc_lo, P(None, "recv"))
    kd = np.asarray(jax.random.key_data(enc_key))
    g_key = jax.random.wrap_key_data(place(kd, P()))

    from ..config import settings

    c1h, c1l, c2h, c2l = _encrypt_kernel_sharded(
        params, mesh, g_a, g_b, g_sh, g_sl, g_key, None, None, False,
        settings.kernel_noise_stream())

    # c1 is replicated (out_spec P()): every process holds a full copy
    def full(arr):
        return np.asarray(arr.addressable_shards[0].data)

    assert np.array_equal(full(c1h), ref_c1h), "c1 hi mismatch"
    assert np.array_equal(full(c1l), ref_c1l), "c1 lo mismatch"
    # c2 is row-sharded over recv: verify exactly the rows this process owns
    rows_checked = 0
    for hs, ls in zip(c2h.addressable_shards, c2l.addressable_shards):
        idx = hs.index
        assert np.array_equal(np.asarray(hs.data), ref_c2h[idx]), idx
        assert np.array_equal(np.asarray(ls.data), ref_c2l[idx]), idx
        rows_checked += np.asarray(hs.data).shape[0]
    assert rows_checked > 0

    # -- sharded decrypt across processes (party 1), on-device decode ----
    party = 1
    assert device_decode.decode_supported(params)
    sk = parties[party].secret_key.to_polynomials()
    g_skh = place(np.asarray(sk.hi), P("kdim"))
    g_skl = place(np.asarray(sk.lo), P("kdim"))
    g_c1h = place(ref_c1h, P("kdim", "recv"))
    g_c1l = place(ref_c1l, P("kdim", "recv"))
    g_c2h = place(ref_c2h[party], P("recv"))
    g_c2l = place(ref_c2l[party], P("recv"))
    out = _noisy_sharded(params, mesh, True, g_skh, g_skl,
                         g_c1h, g_c1l, g_c2h, g_c2l)   # uint32 [2, d]
    expected = vectors[:, party]
    msgs_checked = 0
    for sh in out.addressable_shards:
        data = np.asarray(sh.data)                     # [2, d_local]
        vals = (data[0].astype(np.uint64) << np.uint64(32)) | \
            data[1].astype(np.uint64)
        dl = sh.index[1]
        assert np.array_equal(vals, expected[dl]), (sh.index, vals)
        msgs_checked += vals.shape[0]
    assert msgs_checked > 0

    print(f"{OK_MARKER} p{process_id}/{num_processes}: mesh "
          f"(recv={total // kdim}, kdim={kdim}) over {num_processes} "
          f"processes x {local_devices} devices; encrypt bit-identical "
          f"({rows_checked} owned c2 rows + replicated c1), sharded "
          f"device-decode decrypt exact ({msgs_checked} owned messages)",
          flush=True)


def dryrun_multiprocess(num_processes: int = 2, local_devices: int = 2,
                        timeout_s: float = 600.0) -> str:
    """Spawn ``num_processes`` jax.distributed CPU processes running
    :func:`run_worker`, each holding ``local_devices`` virtual devices,
    with the (recv, kdim) mesh spanning the processes. Raises unless every
    worker verifies its shards bit-exactly. Returns a one-line summary."""
    port = 21000 + (os.getpid() % 9000)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "pvw_tpu.parallel.multiprocess",
             str(pid), str(num_processes), str(port), str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise RuntimeError(
            "multi-process dryrun timed out; partial output:\n"
            + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or OK_MARKER not in out:
            raise RuntimeError(
                f"multi-process worker {pid} failed "
                f"(rc={p.returncode}):\n{out}")
    summary = (f"multiprocess mesh OK: {num_processes} processes x "
               f"{local_devices} devices, encrypt+decrypt bit-identical "
               f"across process boundaries")
    return summary


if __name__ == "__main__":
    run_worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
               int(sys.argv[4]))
