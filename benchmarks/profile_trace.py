"""Capture a jax.profiler device trace of the fused encryption kernel and
print per-op device times (parsed from the xplane protobuf via
tensorboard_plugin_profile). Run on TPU:
``python benchmarks/profile_trace.py [batch]``."""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

N, K, ELL = 4096, 256, 8
D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
MODULI = (0xFFFFC4001, 0x1FFFFE0001)
TRACE_DIR = "/tmp/pvw_trace"


def main():
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.ops import u64 as u64op
    from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    a = rng.integers(0, 1 << 36, (len(MODULI), 1, K, K), np.uint64) % qs
    b = rng.integers(0, 1 << 36, (len(MODULI), 1, N, K), np.uint64) % qs
    a = np.broadcast_to(np.moveaxis(a, (0, 1), (2, 3)),
                        (K, K, len(MODULI), ELL)).copy()
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)),
                        (N, K, len(MODULI), ELL)).copy()
    import jax.numpy as jnp

    from pvw_tpu.ops import modmat

    # device-resident operands: numpy args would re-upload the 134 MB key
    # matrix through the tunnel on EVERY call (~1.1 s/call measured)
    ah, al = map(jnp.asarray, u64op.split_u64_np(a))
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    a_dig = modmat.lhs_digit_planes(ah, al, params.ring)
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    sc = rng.integers(0, 1 << 32, (D, N), np.uint64)
    sch, scl = _scalars_to_pairs(sc)
    key = jax.random.key(0)

    def run(i):
        from pvw_tpu.config import settings

        return _encrypt_kernel(params, a_dig, b_dig, sch, scl,
                               jax.random.fold_in(key, i), False,
                               None, None, settings.kernel_noise_stream())

    out = run(0)
    np.asarray(out[0][(0,) * out[0].ndim])  # warm compile + scalar sync
    t0 = time.time()
    for i in range(1, 6):
        out = run(i)
    np.asarray(out[0][(0,) * out[0].ndim])
    print(f"steady-state: {(time.time()-t0)/5*1000:.2f} ms/batch-{D}")

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for i in range(6, 9):
            out = run(i)
        np.asarray(out[0][(0,) * out[0].ndim])

    # ---- parse the chrome trace for device op durations (the
    # tensorboard xplane_pb2 import is broken in this image) ----
    import collections
    import gzip
    import json as _json

    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace produced; trace dir:", os.listdir(TRACE_DIR))
        return
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = _json.load(f)
    ev = data["traceEvents"]
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in ev if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            tn = tids.get((e["pid"], e["tid"]), "")
            if "XLA" in tn:
                k2 = (tn, e["name"][:70])
                tot[k2] += e["dur"]
                cnt[k2] += 1
    for (tn, nm), us in tot.most_common(30):
        print(f"[{tn:12s}] {nm:70s} {us/1000:9.2f} ms x{cnt[(tn, nm)]}")


if __name__ == "__main__":
    main()
