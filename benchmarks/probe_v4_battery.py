"""Statistical battery on the ACTUAL hardware stream-v4 noise (VERDICT r4
next-round #5): the README threat model's residual-risk claim (possible
inter-sample correlation in the unspecified TPU hardware PRNG) is
empirically checkable in-image and was never tested. This probe draws
>= 10^8 samples from the production extraction path (zero-lhs fused
kernel -> inverse NTT -> centered values, exactly the golden pipeline of
probe_noise_v4.py) across multiple keys, and computes ON DEVICE (only
scalar aggregates cross the tunnel):

- chi-square against the uniform distribution over [-bound, bound]
  (2*bound+1 cells);
- serial correlation at lags 1 and 2 along all three sample axes
  (adjacent batch columns, adjacent rows, adjacent ring coefficients) —
  the axes along which the generator emits consecutive words;
- a runs test (sign-agreement rate of adjacent nonzero samples);
- cross-tile correlation between corresponding positions of adjacent
  (tile_m, tile_n) blocks — nonzero would mean tiles reuse a stream
  (the blockmix-injectivity failure mode);
- limb consistency is already pinned by probe_noise_v4.

Each statistic is reported as a z-score; |z| < 4 passes (with ~20
statistics and N ~ 1.3e8, |z| ~ 4 is a < 1e-3 family-wise false-alarm
bound). The same battery runs on the v3k stream (in-kernel threefry,
round 5) and legacy v3 for reference columns.

Results are recorded in DESIGN.md §10 and cited by the README threat
model. Run: python benchmarks/probe_v4_battery.py [iters]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from pvw_tpu.ops import ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import kernel_noise_available, matmul_fold_scaled
from pvw_tpu.params.ring import get_ring

MODULI = (0xFFFFC4001, 0x1FFFFE0001)
L_DEG = 8
ROWS, D, K = 1024, 2048, 256
BOUND = 200
TILES = (512, 128)
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def _values_v4(ring, key_words_i32, bound, stream):
    """One extraction: centered int32 noise values [ROWS, D, l] from the
    production kernel path (stream 'v4' hw PRNG or 'v3k' threefry)."""
    l = ring.degree
    nd = ring.num_digits
    L = ring.num_limbs
    zero_dig = jnp.zeros((L, l, ROWS, K * nd), jnp.int8)
    rs = jnp.zeros((L, l, nd, K * nd, D), jnp.int8)   # band layout
    seeds = jnp.concatenate([key_words_i32, jnp.zeros(2, jnp.int32)])
    jr = ntt_ops.signed_digit_count(bound)
    gen = ((seeds, jr, bound, "tfry") if stream == "v3k"
           else (seeds, jr, bound))
    oh, ol = matmul_fold_scaled(None, rs, ring, lhs_dig=zero_dig,
                                gen_noise=gen)
    zh = jnp.transpose(oh, (2, 3, 0, 1))
    zl = jnp.transpose(ol, (2, 3, 0, 1))
    nh, nl = ntt_ops.ntt_inverse((zh, zl), ring)
    # limb 0 residues -> centered signed values, 32-bit-safe: |v| <= bound
    # means the residue is either v (lo word = v) or q - |v| (lo word =
    # q_lo - |v|, no borrow since q_lo >> bound)
    lo = nl[..., 0, :]
    q_lo = np.uint32(MODULI[0] & 0xFFFFFFFF)
    return jnp.where(lo <= np.uint32(bound), lo.astype(jnp.int32),
                     -((q_lo - lo).astype(jnp.int32)))


def _values_v3(ring, key, bound):
    from pvw_tpu.sampling.uniform import sample_uniform_signed_rows

    return sample_uniform_signed_rows(key, 0, ROWS, (D, ring.degree), bound)


@jax.jit
def _aggregate(v):
    """Scalar aggregates of one [ROWS, D, l] int32 sample block."""
    b = BOUND
    # float32 on device; float64 accumulation happens on the host per
    # iteration (XLA's tree reductions keep the per-block float32 error
    # ~eps*log2(n)*S, well under the z-score resolution needed)
    vf = v.astype(jnp.float32)
    hist = jnp.bincount((v + b).reshape(-1), length=2 * b + 1)
    s1 = jnp.sum(vf)
    s2 = jnp.sum(vf * vf)
    lags = {}
    for axis, name in ((1, "col"), (0, "row"), (2, "coef")):
        for lag in (1, 2):
            a = jnp.take(vf, jnp.arange(vf.shape[axis] - lag), axis=axis)
            bb = jnp.take(vf, jnp.arange(lag, vf.shape[axis]), axis=axis)
            lags[f"{name}{lag}"] = (jnp.sum(a * bb), a.size)
    # runs: adjacent nonzero sign agreement along the column axis
    sgn = jnp.sign(v)
    both = (sgn[:, :-1] != 0) & (sgn[:, 1:] != 0)
    agree = jnp.sum(jnp.where(both, (sgn[:, :-1] == sgn[:, 1:]), False))
    nboth = jnp.sum(both)
    # cross-tile: corresponding positions of horizontally/vertically
    # adjacent (tile_m, tile_n) blocks
    tm, tn = TILES
    t = vf.reshape(ROWS // tm, tm, D // tn, tn, vf.shape[2])
    ct_h = jnp.sum(t[:, :, :-1] * t[:, :, 1:])
    nt_h = t[:, :, :-1].size
    ct_v = jnp.sum(t[:-1] * t[1:])
    nt_v = t[:-1].size
    return hist, s1, s2, lags, (agree, nboth), (ct_h, nt_h, ct_v, nt_v)


def battery(stream: str):
    ring = get_ring(MODULI, L_DEG)
    from pvw_tpu.config import settings

    prev = (settings.tile_m, settings.tile_n)
    settings.tile_m, settings.tile_n = TILES
    try:
        if stream in ("v4", "v3k"):
            assert kernel_noise_available(ring, ROWS, D, K, BOUND, False,
                                          False, tfry=stream == "v3k")
        hist = np.zeros(2 * BOUND + 1, np.int64)
        s1 = s2 = 0.0
        lag_s = {}
        agree = nboth = 0
        ct = np.zeros(4)
        root = jax.random.key(20250821)
        for i in range(ITERS):
            kk = jax.random.fold_in(root, i)
            if stream == "v3":
                v = _values_v3(ring, kk, BOUND)
            else:
                kw = jax.lax.bitcast_convert_type(
                    jax.random.key_data(kk).reshape(2), jnp.int32)
                v = _values_v4(ring, kw, BOUND, stream)
            h, a1, a2, lags, runs, cross = _aggregate(v)
            hist += np.asarray(h)
            s1 += float(a1)
            s2 += float(a2)
            for kname, (s, cnt) in lags.items():
                acc = lag_s.setdefault(kname, [0.0, 0])
                acc[0] += float(s)
                acc[1] += int(cnt)
            agree += int(runs[0])
            nboth += int(runs[1])
            ct += np.array([float(cross[0]), cross[1],
                            float(cross[2]), cross[3]])
        n = int(hist.sum())
        cells = 2 * BOUND + 1
        exp = n / cells
        chi2 = float(((hist - exp) ** 2 / exp).sum())
        df = cells - 1
        z_chi = (chi2 - df) / np.sqrt(2 * df)
        mean = s1 / n
        var = s2 / n - mean ** 2
        out = {"stream": stream, "samples": n, "mean": mean,
               "var": var, "var_exp": (cells * cells - 1) / 12.0,
               "chi2": chi2, "df": df, "z_chi2": z_chi}
        for kname, (s, cnt) in sorted(lag_s.items()):
            r = (s / cnt - mean * mean) / var
            out[f"z_{kname}"] = r * np.sqrt(cnt)
        p_agree = agree / nboth
        out["z_runs"] = (p_agree - 0.5) * 2 * np.sqrt(nboth)
        for tag, (s, cnt) in (("tileH", (ct[0], ct[1])),
                              ("tileV", (ct[2], ct[3]))):
            r = (s / cnt - mean * mean) / var
            out[f"z_{tag}"] = r * np.sqrt(cnt)
        return out
    finally:
        settings.tile_m, settings.tile_n = prev


def main():
    assert jax.default_backend() == "tpu", "battery targets the hw stream"
    for stream in ("v4", "v3k", "v3"):
        res = battery(stream)
        zs = {k: round(v, 2) for k, v in res.items()
              if k.startswith("z_")}
        worst = max(abs(v) for v in zs.values())
        print(f"{stream}: N={res['samples'] / 1e6:.0f}M "
              f"mean={res['mean']:+.4f} var={res['var']:.1f} "
              f"(exp {res['var_exp']:.1f}) chi2={res['chi2']:.0f}/"
              f"df{res['df']}", flush=True)
        print(f"  z-scores: {zs}", flush=True)
        print(f"  worst |z| = {worst:.2f} -> "
              f"{'PASS' if worst < 4 else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
