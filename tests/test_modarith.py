"""Exactness tests for the u32-lane modular arithmetic core.

Every primitive is checked against Python's arbitrary-precision integers
over randomized inputs including adversarial edge cases (0, 1, q-1, values
with all-ones words). This is the TPU analogue of trusting fhe-math's
``zq`` layer (SURVEY.md §2.3) — except here it's proven by test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvw_tpu.ops import u64 as u
from pvw_tpu.ops import modmat
from pvw_tpu.params.ring import RingPlan

RNG = np.random.default_rng(1234)
MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)
BIG_MODULI = (0x800000022A0001, 0x800000021A0001)  # 55-bit chain


def rand_u64(shape, bound=1 << 64):
    vals = RNG.integers(0, bound, size=shape, dtype=np.uint64) if bound <= (1 << 63) \
        else RNG.integers(0, 1 << 63, size=shape, dtype=np.uint64) * 2 + RNG.integers(0, 2, size=shape, dtype=np.uint64)
    return vals


def pairs(x):
    hi, lo = u.split_u64_np(x)
    return jnp.asarray(hi), jnp.asarray(lo)


def ints(hi, lo):
    return u.join_u64_np(np.asarray(hi), np.asarray(lo))


class TestWideMul:
    def test_mul32_wide_random(self):
        x = RNG.integers(0, 1 << 32, size=(1000,), dtype=np.uint64).astype(np.uint32)
        y = RNG.integers(0, 1 << 32, size=(1000,), dtype=np.uint64).astype(np.uint32)
        hi, lo = u.mul32_wide(jnp.asarray(x), jnp.asarray(y))
        got = np.asarray(hi).astype(np.uint64) << np.uint64(32) | np.asarray(lo)
        want = x.astype(np.uint64) * y.astype(np.uint64)
        np.testing.assert_array_equal(got, want)

    def test_mul32_wide_edges(self):
        edge = np.array([0, 1, 0xFFFF, 0x10000, 0xFFFFFFFF, 0x80000000], np.uint32)
        xs, ys = np.meshgrid(edge, edge)
        hi, lo = u.mul32_wide(jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()))
        got = np.asarray(hi).astype(np.uint64) << np.uint64(32) | np.asarray(lo)
        want = xs.ravel().astype(np.uint64) * ys.ravel().astype(np.uint64)
        np.testing.assert_array_equal(got, want)

    def test_mul64_wide_random(self):
        x = rand_u64((500,))
        y = rand_u64((500,))
        w3, w2, w1, w0 = u.mul64_wide(*pairs(x), *pairs(y))
        for i in range(500):
            want = int(x[i]) * int(y[i])
            got = (
                int(np.asarray(w3)[i]) << 96
            ) | (int(np.asarray(w2)[i]) << 64) | (int(np.asarray(w1)[i]) << 32) | int(
                np.asarray(w0)[i]
            )
            assert got == want

    def test_add_sub64(self):
        x = rand_u64((500,))
        y = rand_u64((500,))
        sh, sl = u.add64(*pairs(x), *pairs(y))
        np.testing.assert_array_equal(
            ints(sh, sl), (x + y)  # numpy uint64 wraps mod 2^64
        )
        dh, dl = u.sub64(*pairs(x), *pairs(y))
        np.testing.assert_array_equal(ints(dh, dl), (x - y))

    def test_cmp64(self):
        x = rand_u64((500,))
        y = rand_u64((500,))
        lt = np.asarray(u.lt64(*pairs(x), *pairs(y)))
        np.testing.assert_array_equal(lt, x < y)


@pytest.mark.parametrize("q", list(MODULI) + list(BIG_MODULI))
class TestModOps:
    def test_addmod_submod(self, q):
        x = rand_u64((400,), q).astype(np.uint64)
        y = rand_u64((400,), q).astype(np.uint64)
        qh, ql = u.const_pair(q)
        sh, sl = u.addmod(*pairs(x), *pairs(y), qh, ql)
        np.testing.assert_array_equal(
            ints(sh, sl), (x.astype(object) + y.astype(object)) % q
        )
        dh, dl = u.submod(*pairs(x), *pairs(y), qh, ql)
        np.testing.assert_array_equal(
            ints(dh, dl), (x.astype(object) - y.astype(object)) % q
        )

    def test_negmod(self, q):
        x = np.concatenate([[0, 1, q - 1], rand_u64((100,), q)]).astype(np.uint64)
        qh, ql = u.const_pair(q)
        nh, nl = u.negmod(*pairs(x), qh, ql)
        np.testing.assert_array_equal(ints(nh, nl), (-x.astype(object)) % q)

    def test_shoup_mul64(self, q):
        w = int(RNG.integers(0, q))
        wp, _ = u.shoup_constants(w, q)
        x = np.concatenate([[0, 1, q - 1, (1 << 64) - 1], rand_u64((500,))]).astype(
            np.uint64
        )
        rh, rl = u.shoup_mul_const(*pairs(x), w, wp, q)
        want = (x.astype(object) * w) % q
        np.testing.assert_array_equal(ints(rh, rl).astype(object), want)

    def test_shoup_mul32(self, q):
        w = int(RNG.integers(0, q))
        _, wp32 = u.shoup_constants(w, q)
        x = np.concatenate(
            [[0, 1, (1 << 32) - 1], RNG.integers(0, 1 << 32, size=(500,), dtype=np.uint64)]
        ).astype(np.uint32)
        rh, rl = u.shoup_mul_const32(jnp.asarray(x), w, wp32, q)
        want = (x.astype(object) * w) % q
        np.testing.assert_array_equal(ints(rh, rl).astype(object), want)


class TestDigits:
    def test_roundtrip(self):
        vals = np.concatenate(
            [[0, 1, 255, 256, (1 << 62) - 1], rand_u64((1000,), 1 << 62)]
        ).astype(np.uint64)
        d = np.asarray(modmat.digits(*pairs(vals))).astype(np.int64)
        recon = sum(d[..., i] * (1 << (8 * i)) for i in range(8))
        np.testing.assert_array_equal(recon.astype(np.uint64), vals)
        assert d.min() >= -128 and d.max() <= 127


class TestMatmul:
    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    def test_matmul_channels_exact(self, moduli):
        ring = RingPlan(moduli, 8)
        L, S, m, k, n = ring.num_limbs, 3, 4, 5, 2
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        oh, ol = modmat.matmul_channels(pairs(a), pairs(b), ring)
        got = ints(oh, ol)
        for i, q in enumerate(moduli):
            want = np.zeros((S, m, n), object)
            for s in range(S):
                want[s] = (a[i, s].astype(object) @ b[i, s].astype(object)) % q
            np.testing.assert_array_equal(got[i].astype(object), want)

    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    def test_matmul_channels_scaled_exact(self, moduli):
        """The scaled-digit form (prescale rhs by 2^(8i) mod q; nd narrow
        columns) must produce bit-identical residues to matmul_channels."""
        ring = RingPlan(moduli, 8)
        L, S, m, k, n = ring.num_limbs, 3, 4, 5, 2
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        ref = modmat.matmul_channels(pairs(a), pairs(b), ring)
        got = modmat.matmul_channels_scaled(pairs(a), pairs(b), ring)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))

    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    def test_pallas_scaled_kernel_interpret(self, moduli):
        """The fused Pallas scaled kernel (interpret mode off-TPU) matches
        the XLA scaled path exactly at TPU-friendly tile shapes."""
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(moduli, 8)
        nd = ring.num_digits
        L, S, m, k, n = ring.num_limbs, 2, 128, 8, 128
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        td = modmat.prescale_digits(pairs(b), ring)
        ref = modmat._fold_leading(
            modmat.scaled_cols(pairs(a), td, ring), ring
        )
        lh, ll = pairs(a)
        ld = modmat.digits(lh, ll, nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(td).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        for use_words in (False, ring.fold_words_ok):
            oh, ol = pm._fused_banded_matmul(
                ld, jnp.asarray(r2), tables, 64, 128, True, use_words
            )
            np.testing.assert_array_equal(
                np.asarray(oh).reshape(L, S, m, n), np.asarray(ref[0])
            )
            np.testing.assert_array_equal(
                np.asarray(ol).reshape(L, S, m, n), np.asarray(ref[1])
            )

    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    @pytest.mark.parametrize("ncols", [1, 2, 4, 5, 8, 9, 15])
    def test_fold_columns_words_exact(self, moduli, ncols):
        """The word-regrouped fold must be bit-identical to the grouped
        fold for every column count and modulus size (q > 2^32)."""
        ring = RingPlan(moduli, 8)
        L = ring.num_limbs
        assert ring.fold_words_ok
        cols = RNG.integers(-(1 << 31), 1 << 31, size=(L, 3, 7, ncols),
                            dtype=np.int64).astype(np.int32)
        cj = jnp.asarray(cols)
        sh = (L, 1, 1, 4)
        bias = ring.bias_pair_for_columns(ncols)
        common = (
            jnp.asarray(bias[0]).reshape(L, 1, 1),
            jnp.asarray(bias[1]).reshape(L, 1, 1),
            jnp.asarray(ring.q_hi).reshape(L, 1, 1),
            jnp.asarray(ring.q_lo).reshape(L, 1, 1),
        )
        gh, gl = u.fold_columns_grouped(
            cj,
            jnp.asarray(ring.grp_hi).reshape(sh),
            jnp.asarray(ring.grp_lo).reshape(sh),
            jnp.asarray(ring.grp_sh).reshape(sh),
            jnp.asarray(ring.grp_sl).reshape(sh),
            *common,
        )
        wh, wl = u.fold_columns_words(
            cj,
            jnp.asarray(ring.wrd_hi).reshape(sh),
            jnp.asarray(ring.wrd_lo).reshape(sh),
            jnp.asarray(ring.wrd_wp32).reshape(sh),
            *common,
        )
        np.testing.assert_array_equal(np.asarray(gh), np.asarray(wh))
        np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))

    @pytest.mark.parametrize("moduli,bound", [(MODULI, 50),
                                              (BIG_MODULI, 2000)])
    def test_noise_fused_matmul_exact(self, moduli, bound):
        """The noise-fused scaled matmul (error NTT computed in-kernel
        from signed digit planes + post-fold encode addmod) must be
        bit-identical to matmul, NTT-then-addmod, then addmod — both the
        XLA fallback and the Pallas kernel in interpret mode."""
        from pvw_tpu.ops import ntt as ntt_ops
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(moduli, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        rng = np.random.default_rng(7)
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa, pb = pairs(a), pairs(b)
        rs = modmat.prescale_digits(pb, ring)
        ev = rng.integers(-bound, bound + 1, (m, n, l)).astype(np.int32)
        post = (rand_u64((L, S, m, n)) % qs).astype(np.uint64)
        pph, ppl = pairs(post)
        # reference: separate NTT + two addmods
        base = modmat._fold_leading(modmat.scaled_cols(pa, rs, ring), ring)
        eh, el = ntt_ops.ntt_forward_signed(jnp.asarray(ev), ring, bound)
        qh = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
        ql = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)
        refh, refl = u.addmod(
            base[0], base[1],
            jnp.transpose(eh, (2, 3, 0, 1)), jnp.transpose(el, (2, 3, 0, 1)),
            qh, ql,
        )
        refh, refl = u.addmod(refh, refl, pph, ppl, qh, ql)
        jr = ntt_ops.signed_digit_count(bound)
        dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
        planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
        # XLA fallback (off-TPU the public entry routes here)
        goth, gotl = pm.matmul_fold_scaled(
            pa, rs, ring, noise=planes, post=(pph, ppl)
        )
        np.testing.assert_array_equal(np.asarray(goth), np.asarray(refh))
        np.testing.assert_array_equal(np.asarray(gotl), np.asarray(refl))
        # Pallas kernel, interpret mode
        ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        ntab = jnp.asarray(
            ring.ntt_scaled_tab(jr), jnp.int32
        ).reshape(L * S, l * jr, nd)
        pch = (pph.reshape(L * S, m, n), ppl.reshape(L * S, m, n))
        for use_words in (False, ring.fold_words_ok):
            oh, ol = pm._fused_scaled_noise_matmul(
                ld, jnp.asarray(r2), tables, ntab, planes, pch, None,
                8, 4, True, use_words,
            )
            np.testing.assert_array_equal(
                np.asarray(oh).reshape(L, S, m, n), np.asarray(refh)
            )
            np.testing.assert_array_equal(
                np.asarray(ol).reshape(L, S, m, n), np.asarray(refl)
            )

    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    def test_prescale_band_layout(self, moduli):
        """prescale_digits_band must equal the transpose-built band of
        prescale_digits value-for-value, and matmul_fold_scaled must
        accept either layout with bit-identical results (incl. noise)."""
        from pvw_tpu.ops import ntt as ntt_ops
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(moduli, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        rng = np.random.default_rng(5)
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa, pb = pairs(a), pairs(b)
        rs6 = modmat.prescale_digits(pb, ring)
        band = modmat.prescale_digits_band(pb, ring)
        ref_band = pm._build_rhs_scaled(
            np.asarray(rs6).reshape(L * S, k, n, nd, nd)
        ).reshape(L, S, nd, k * nd, n)
        np.testing.assert_array_equal(np.asarray(band), np.asarray(ref_band))
        # XLA fallback path parity on both layouts (+ noise planes)
        bound = 50
        ev = rng.integers(-bound, bound + 1, (m, n, l)).astype(np.int32)
        jr = ntt_ops.signed_digit_count(bound)
        dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
        planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
        r6 = pm.matmul_fold_scaled(pa, rs6, ring, noise=planes)
        rb = pm.matmul_fold_scaled(pa, band, ring, noise=planes)
        np.testing.assert_array_equal(np.asarray(r6[0]), np.asarray(rb[0]))
        np.testing.assert_array_equal(np.asarray(r6[1]), np.asarray(rb[1]))

    @pytest.mark.parametrize("moduli,bound", [(MODULI, 50),
                                              (BIG_MODULI, 2000)])
    def test_noise_value_planes_exact(self, moduli, bound):
        """The value-plane noise MAC (noise_vals: int32 noise values
        against the jr=1 scaled-twiddle table, composed in-kernel from
        the input digit planes) must be bit-identical to the digit-plane
        MAC — same algebra, fewer VPU ops (DESIGN.md §5a)."""
        from pvw_tpu.ops import ntt as ntt_ops
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(moduli, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        rng = np.random.default_rng(11)
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa, pb = pairs(a), pairs(b)
        rs = modmat.prescale_digits(pb, ring)
        ev = rng.integers(-bound, bound + 1, (m, n, l)).astype(np.int32)
        jr = ntt_ops.signed_digit_count(bound)
        dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
        planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
        assert pm._noise_vals_mode(ring, k, jr, bound)
        # reference: the digit-plane XLA path (itself pinned against
        # NTT-then-addmod by test_noise_fused_matmul_exact)
        refh, refl = pm.matmul_fold_scaled(pa, rs, ring, noise=planes)
        ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        ntab1 = jnp.asarray(
            ring.ntt_scaled_tab(1), jnp.int32
        ).reshape(L * S, l, nd)
        for use_words in (False, ring.fold_words_ok):
            oh, ol = pm._fused_scaled_noise_matmul(
                ld, jnp.asarray(r2), tables, ntab1, planes, None, None,
                8, 4, True, use_words, False, None, None, l, jr,
            )
            np.testing.assert_array_equal(
                np.asarray(oh).reshape(L, S, m, n), np.asarray(refh)
            )
            np.testing.assert_array_equal(
                np.asarray(ol).reshape(L, S, m, n), np.asarray(refl)
            )

    @pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
    def test_in_kernel_encode_exact(self, moduli):
        """The in-kernel gadget encode (scalar tile + per-channel g/wrap
        constants) must match shoup-encode-then-addmod exactly — XLA
        fallback and Pallas interpret mode, including the u64->i64 wrap
        for scalars >= 2^63."""
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(moduli, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        qs = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa = pairs(a)
        rs = modmat.prescale_digits(pairs(b), ring)
        # scalars spanning the u64 range incl. the i64-wrap region
        sc = rand_u64((m, n))
        sc[0, 0] = 0
        sc[1, 0] = (1 << 64) - 1
        sc[2, 0] = 1 << 63
        sch, scl = pairs(sc)
        # per-channel gadget-like constants: random g < q
        g = (rand_u64((L, S)) % np.array(moduli, np.uint64)[:, None])
        gs = np.zeros((L, S), np.uint64)
        wrap = np.zeros((L, S), np.uint64)
        for i, q in enumerate(moduli):
            for s in range(S):
                gs[i, s] = (int(g[i, s]) << 64) // q
                wrap[i, s] = (pow(2, 64, q) * int(g[i, s])) % q
        etab = jnp.asarray(pm.encode_tab(g, gs, wrap, moduli))
        # reference: matmul + explicit encode residues addmod
        base = modmat._fold_leading(modmat.scaled_cols(pa, rs, ring), ring)
        want = np.zeros((L, S, m, n), object)
        for i, q in enumerate(moduli):
            for s in range(S):
                for mm in range(m):
                    for nn in range(n):
                        v = int(sc[mm, nn])
                        if v >= 1 << 63:
                            v -= 1 << 64
                        enc = (v * int(g[i, s])) % q
                        base_v = (int(np.asarray(base[0])[i, s, mm, nn]) << 32
                                  ) | int(np.asarray(base[1])[i, s, mm, nn])
                        want[i, s, mm, nn] = (base_v + enc) % q
        encode = ((sch, scl, etab))
        goth, gotl = pm.matmul_fold_scaled(pa, rs, ring, encode=encode)
        got = ints(goth, gotl)
        np.testing.assert_array_equal(got.astype(object), want)
        # Pallas kernel, interpret mode
        ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        ntab = jnp.zeros((L * S, 1, nd), jnp.int32)
        zero_noise = jnp.zeros((1, m, n), jnp.int8)
        for use_words in (False, True):
            oh, ol = pm._fused_scaled_noise_matmul(
                ld, jnp.asarray(r2), tables, ntab, zero_noise, None,
                (sch, scl, etab), 8, 4, True, use_words,
            )
            got = ints(oh, ol).reshape(L, S, m, n)
            np.testing.assert_array_equal(got.astype(object), want)
        # encode32 fast path: small scalars must produce the identical
        # residues through the 32-bit Shoup branch
        sc32 = sc % (1 << 32)
        sch32, scl32 = pairs(sc32)
        ref32h, ref32l = pm._fused_scaled_noise_matmul(
            ld, jnp.asarray(r2), tables, ntab, zero_noise, None,
            (sch32, scl32, etab), 8, 4, True, True, False,
        )
        got32h, got32l = pm._fused_scaled_noise_matmul(
            ld, jnp.asarray(r2), tables, ntab, zero_noise, None,
            (sch32, scl32, etab), 8, 4, True, True, True,
        )
        np.testing.assert_array_equal(np.asarray(got32h), np.asarray(ref32h))
        np.testing.assert_array_equal(np.asarray(got32l), np.asarray(ref32l))

    def test_noise_kernel_post_only_interpret(self):
        """The Pallas kernel's post-only branch (zero noise planes + the
        encode addmod) matches matmul-then-addmod exactly."""
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(MODULI, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        qs = np.array(MODULI, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa = pairs(a)
        rs = modmat.prescale_digits(pairs(b), ring)
        post = (rand_u64((L, S, m, n)) % qs).astype(np.uint64)
        pph, ppl = pairs(post)
        base = modmat._fold_leading(modmat.scaled_cols(pa, rs, ring), ring)
        qh = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
        ql = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)
        refh, refl = u.addmod(base[0], base[1], pph, ppl, qh, ql)
        ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        ntab = jnp.zeros((L * S, 1, nd), jnp.int32)
        zero_noise = jnp.zeros((1, m, n), jnp.int8)
        pch = (pph.reshape(L * S, m, n), ppl.reshape(L * S, m, n))
        oh, ol = pm._fused_scaled_noise_matmul(
            ld, jnp.asarray(r2), tables, ntab, zero_noise, pch, None,
            8, 4, True,
        )
        np.testing.assert_array_equal(
            np.asarray(oh).reshape(L, S, m, n), np.asarray(refh)
        )
        np.testing.assert_array_equal(
            np.asarray(ol).reshape(L, S, m, n), np.asarray(refl)
        )

    def test_poly_matmul_layout(self):
        ring = RingPlan(MODULI, 8)
        m, k, n, L, l = 3, 4, 2, ring.num_limbs, ring.degree
        qs = np.array(MODULI, np.uint64).reshape(1, 1, L, 1)
        a = (rand_u64((m, k, L, l)) % qs).astype(np.uint64)
        b = (rand_u64((k, n, L, l)) % qs).astype(np.uint64)
        oh, ol = modmat.poly_matmul(pairs(a), pairs(b), ring)
        got = ints(oh, ol)
        for i, q in enumerate(MODULI):
            for s in range(l):
                want = (a[:, :, i, s].astype(object) @ b[:, :, i, s].astype(object)) % q
                np.testing.assert_array_equal(got[:, :, i, s].astype(object), want)

    def test_pointwise_mul(self):
        ring = RingPlan(MODULI, 8)
        L, l = ring.num_limbs, ring.degree
        qs = np.array(MODULI, np.uint64).reshape(1, L, 1)
        a = (rand_u64((7, L, l)) % qs).astype(np.uint64)
        b = (rand_u64((7, L, l)) % qs).astype(np.uint64)
        oh, ol = modmat.poly_pointwise_mul(pairs(a), pairs(b), ring)
        want = (a.astype(object) * b.astype(object)) % qs.astype(object)
        np.testing.assert_array_equal(ints(oh, ol).astype(object), want)

    def test_poly_add_sub(self):
        ring = RingPlan(MODULI, 8)
        L, l = ring.num_limbs, ring.degree
        qs = np.array(MODULI, np.uint64).reshape(1, L, 1)
        a = (rand_u64((5, L, l)) % qs).astype(np.uint64)
        b = (rand_u64((5, L, l)) % qs).astype(np.uint64)
        sh, sl = modmat.poly_add(pairs(a), pairs(b), ring)
        np.testing.assert_array_equal(
            ints(sh, sl).astype(object), (a.astype(object) + b.astype(object)) % qs.astype(object)
        )
        dh, dl = modmat.poly_sub(pairs(a), pairs(b), ring)
        np.testing.assert_array_equal(
            ints(dh, dl).astype(object), (a.astype(object) - b.astype(object)) % qs.astype(object)
        )

    def test_from_signed_coeffs(self):
        ring = RingPlan(MODULI, 8)
        coeffs = np.array([[-3, -1, 0, 1, 2, -2, 5, -5]], np.int32)
        hi, lo = modmat.from_signed_coeffs(jnp.asarray(coeffs), ring)
        got = ints(hi, lo)
        for i, q in enumerate(MODULI):
            np.testing.assert_array_equal(
                got[0, i].astype(object), np.array([int(c) % q for c in coeffs[0]], object)
            )

    def test_jit_compatible(self):
        ring = RingPlan(MODULI, 8)

        @jax.jit
        def f(ah, al, bh, bl):
            return modmat.poly_pointwise_mul((ah, al), (bh, bl), ring)

        L, l = ring.num_limbs, ring.degree
        qs = np.array(MODULI, np.uint64).reshape(1, L, 1)
        a = (rand_u64((2, L, l)) % qs).astype(np.uint64)
        b = (rand_u64((2, L, l)) % qs).astype(np.uint64)
        oh, ol = f(*pairs(a), *pairs(b))
        want = (a.astype(object) * b.astype(object)) % qs.astype(object)
        np.testing.assert_array_equal(ints(oh, ol).astype(object), want)


class TestFromSignedCoeffsRange:
    def test_small_prime_large_coeffs(self):
        """Coefficients larger than a small modulus must reduce correctly
        (the reference's from_coefficients wraps mod each q_i for any i64)."""
        ring = RingPlan((12289, 0xFFFFC4001), 8)  # 14-bit NTT prime + big one
        coeffs = np.array(
            [[-(2**31), 2**31 - 1, 40000, -40000, 12289, -12289, 1, 0]],
            np.int64,
        ).astype(np.int32)
        hi, lo = modmat.from_signed_coeffs(jnp.asarray(coeffs), ring)
        got = ints(hi, lo)
        for li, q in enumerate(ring.moduli):
            for ci in range(8):
                assert int(got[0, li, ci]) == int(coeffs[0, ci]) % q, (li, ci)


class TestSmallModuli:
    """Moduli below 2^32 cannot use the word fold (W_0 < q precondition);
    the kernels must take the grouped-fold path and stay exact."""

    SMALL = (0x100021, 0x100091)  # ~20-bit NTT-friendly primes (l=8)

    def test_fold_words_disabled(self):
        ring = RingPlan(self.SMALL, 8)
        assert not ring.fold_words_ok

    def test_matmul_exact_small_moduli(self):
        ring = RingPlan(self.SMALL, 8)
        L, S, m, k, n = ring.num_limbs, 2, 4, 5, 3
        qs = np.array(self.SMALL, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        got = ints(*modmat.matmul_channels(pairs(a), pairs(b), ring))
        for i, q in enumerate(self.SMALL):
            for s in range(S):
                want = (a[i, s].astype(object) @ b[i, s].astype(object)) % q
                np.testing.assert_array_equal(got[i, s].astype(object), want)
        # scaled form agrees too
        got2 = ints(*modmat.matmul_channels_scaled(pairs(a), pairs(b), ring))
        np.testing.assert_array_equal(got2, got)

    def test_noise_kernel_interpret_small_moduli(self):
        """The fused kernel (interpret mode) must route the grouped fold
        for q < 2^32 and match the XLA path exactly."""
        from pvw_tpu.ops import ntt as ntt_ops
        from pvw_tpu.ops import pallas_modmat as pm

        ring = RingPlan(self.SMALL, 8)
        L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
        S, m, k, n = l, 8, 6, 4
        rng = np.random.default_rng(5)
        qs = np.array(self.SMALL, np.uint64).reshape(L, 1, 1, 1)
        a = (rand_u64((L, S, m, k)) % qs).astype(np.uint64)
        b = (rand_u64((L, S, k, n)) % qs).astype(np.uint64)
        pa = pairs(a)
        rs = modmat.prescale_digits(pairs(b), ring)
        ev = rng.integers(-50, 51, (m, n, l)).astype(np.int32)
        ref = pm.matmul_fold_scaled(pa, rs, ring)  # XLA (off-TPU)
        jr = ntt_ops.signed_digit_count(50)
        dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
        planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
        # reference: XLA with noise
        refn = pm.matmul_fold_scaled(pa, rs, ring, noise=planes)
        # Pallas interpret with use_words=ring.fold_words_ok (False here)
        ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
        r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
        tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
        ntab = jnp.asarray(ring.ntt_scaled_tab(jr), jnp.int32).reshape(
            L * S, l * jr, nd)
        oh, ol = pm._fused_scaled_noise_matmul(
            ld, jnp.asarray(r2), tables, ntab, planes, None, None,
            8, 4, True, ring.fold_words_ok,
        )
        np.testing.assert_array_equal(
            np.asarray(oh).reshape(L, S, m, n), np.asarray(refn[0]))
        np.testing.assert_array_equal(
            np.asarray(ol).reshape(L, S, m, n), np.asarray(refn[1]))
        del ref
