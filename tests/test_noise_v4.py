"""CPU-runnable contract tests for the stream-v4 in-kernel noise.

The production TPU noise path generates its bounded-uniform errors inside
the fused matmul kernel from the hardware PRNG ("stream v4",
``pvw_tpu/ops/pallas_modmat.py _make_fold_body``). The PRNG primitives
themselves (``pltpu.prng_seed/prng_random_bits``) have NO interpret-mode
lowering, so the stream cannot be emulated off-TPU — instead the kernel's
arithmetic contract is factored into pure functions (``v4_blockmix``,
``v4_reduce96``, ``v4_digit_split``) that these tests pin exactly:

* the 96-bit scaled reduction must equal floor(x96 * range / 2^96) — the
  ``sample_bounded_u64`` fast-path semantics — bit-for-bit on every input
  (carry corner cases included);
* the per-tile seed perturbation must be INJECTIVE over every (row, col)
  tile block a supported shape can produce (two tiles sharing a mix would
  draw identical noise — the ``blockmix`` tile-uniqueness invariant);
* the jr=2 digit split must reconstruct the sampled value.

The hardware bits themselves are pinned by a committed TPU golden
(tests/data/noise_v4_golden.json via benchmarks/probe_noise_v4.py),
re-checked whenever a TPU backend is present (test_v4_golden below).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvw_tpu.ops.pallas_modmat import (
    _pick_tiles, v4_blockmix, v4_digit_split, v4_reduce96,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "noise_v4_golden.json")


class TestReduce96:
    def _check(self, b_hi, b_mid, b_lo, rng):
        got = np.asarray(v4_reduce96(
            jnp.asarray(b_hi, jnp.uint32), jnp.asarray(b_mid, jnp.uint32),
            jnp.asarray(b_lo, jnp.uint32), jnp.uint32(rng)))
        x96 = (b_hi.astype(object) << 64) | (b_mid.astype(object) << 32) \
            | b_lo.astype(object)
        want = np.array([(int(x) * rng) >> 96 for x in x96.ravel()],
                        np.uint32).reshape(b_hi.shape)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("rng", [1, 3, 201, 401, 2001, 65535,
                                     (1 << 30) - 1])
    def test_random_inputs(self, rng):
        r = np.random.default_rng(rng)
        b = r.integers(0, 1 << 32, (3, 512), np.uint64).astype(np.uint32)
        self._check(b[0], b[1], b[2], rng)

    def test_carry_corners(self):
        """Inputs engineered to trip both carry corrections (c64a, c64b):
        all-ones words, zero words, and the wrap boundaries."""
        M = np.uint32(0xFFFFFFFF)
        cases = []
        for hi in (0, 1, M, M - 1):
            for mid in (0, 1, M):
                for lo in (0, M):
                    cases.append((hi, mid, lo))
        arr = np.array(cases, np.uint32)
        for rng in (3, 401, (1 << 30) - 1):
            self._check(arr[:, 0], arr[:, 1], arr[:, 2], rng)

    def test_matches_sample_bounded_u64_semantics(self):
        """Same bits -> same value as the threefry sampler's fast path
        (the two streams differ ONLY in the bit source)."""
        from pvw_tpu.ops import u64 as u

        r = np.random.default_rng(5)
        bits = jnp.asarray(
            r.integers(0, 1 << 32, (64, 3), np.uint64).astype(np.uint32))
        rng = 401
        # transcribe sample_bounded_u64's fast path on these bits
        rr = jnp.uint32(rng)
        h0, _ = u.mul32_wide(bits[..., 2], rr)
        h1, l1 = u.mul32_wide(bits[..., 1], rr)
        h2, l2 = u.mul32_wide(bits[..., 0], rr)
        s32 = h0 + l1
        c32 = (s32 < h0).astype(jnp.uint32)
        s64 = h1 + l2
        c64a = (s64 < h1).astype(jnp.uint32)
        s64 = s64 + c32
        c64b = (s64 == 0).astype(jnp.uint32) & c32
        want = h2 + c64a + c64b
        got = v4_reduce96(bits[..., 0], bits[..., 1], bits[..., 2], rr)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestBlockmix:
    @pytest.mark.parametrize("m,n,row_off", [
        (4096, 8192, 0),        # headline c2: n recv x batch
        (4096, 8192, 4096),     # a second recv shard's global offset
        (256, 8192, 0),         # c1 rows
        (8192, 2048, 0),        # pvss_8192 shape
        (1024, 512, 0),
    ])
    def test_tile_uniqueness(self, m, n, row_off):
        """Every (i, j) tile of a supported grid must get a distinct
        PRNG seed perturbation; collisions would duplicate noise values
        across tiles."""
        tiles = _pick_tiles(m, n, 256 * 5, 5, 34)
        assert tiles is not None
        tm, tn = min(tiles[0], m), min(tiles[1], n)
        mixes = set()
        for i in range(-(-m // tm)):
            for j in range(-(-n // tn)):
                mixes.add(int(v4_blockmix(row_off + i * tm, j * tn)))
        assert len(mixes) == (-(-m // tm)) * (-(-n // tn))

    def test_cross_shard_uniqueness(self):
        """Tiles of DIFFERENT recv shards (distinct global row offsets)
        must also never collide — the mask/global-offset contract of the
        sharded v4 path."""
        tm, tn = 512, 128
        nl, n = 1024, 4096
        mixes = set()
        for shard in range(4):
            for i in range(nl // tm):
                for j in range(n // tn):
                    mixes.add(int(v4_blockmix(shard * nl + i * tm, j * tn)))
        assert len(mixes) == 4 * (nl // tm) * (n // tn)

    def test_alignment_contract(self):
        """Mix injectivity relies on 8-row / 128-col tile alignment,
        which _pick_tiles + the Mosaic legality check guarantee; verify
        the quotient packing is lossless at those granularities."""
        assert int(v4_blockmix(8, 0)) != int(v4_blockmix(0, 0))
        assert int(v4_blockmix(0, 128)) != int(v4_blockmix(0, 0))
        # col field saturates at 2^17 blocks without touching row bits
        assert int(v4_blockmix(0, (1 << 17 - 1) * 128)) < (1 << 17)


class TestDigitSplit:
    def test_roundtrip_full_range(self):
        sv = jnp.arange(-2048, 2049, dtype=jnp.int32)
        d0, d1 = v4_digit_split(sv)
        assert int(jnp.max(jnp.abs(d0))) <= 128
        assert np.array_equal(np.asarray(d0 + (d1 << 8)), np.asarray(sv))
        # both digits must fit int8
        assert int(jnp.min(d0)) >= -128 and int(jnp.max(d0)) <= 127
        assert int(jnp.min(d1)) >= -128 and int(jnp.max(d1)) <= 127


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG golden needs the TPU backend")
def test_v4_golden():
    """Re-check the committed hardware-PRNG golden: the v4 noise stream
    for the headline config must reproduce bit-for-bit (catches silent
    changes in seed plumbing, tile selection, or the PRNG contract).
    Regenerate with benchmarks/probe_noise_v4.py --emit-golden."""
    if not os.path.exists(GOLDEN):
        pytest.skip("no golden committed yet (run probe_noise_v4.py "
                    "--emit-golden on TPU)")
    with open(GOLDEN) as f:
        golden = json.load(f)
    from benchmarks.probe_noise_v4 import compute_golden

    got = compute_golden(golden["config"])
    assert got == golden["digest"], (
        "stream-v4 hardware noise changed: seed mixing, tile selection, "
        "or PRNG contract regression")
