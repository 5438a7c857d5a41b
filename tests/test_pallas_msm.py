"""Pallas MSM pipeline parity vs the oracle (interpret mode on CPU).

Shapes are deliberately tiny: interpret-mode Pallas inlines every kernel as
jax ops, and XLA CPU compiles large unrolled graphs pathologically slowly
(docs/ROUND2-NOTES.md §4).  nbits truncation keeps the window count small;
the full-width window count is exercised on the real chip by bench.py.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle import edwards as oe
from zkvm_tpu.oracle import ristretto


def _rand_points(n, seed=0):
    r = random.Random(seed)
    return [
        ristretto.RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n)
    ]


def _assert_proj_eq(got, expect):
    gx, gy, gz, _ = got
    ex, ey, ez, _ = expect
    assert (gx * ez - ex * gz) % P == 0
    assert (gy * ez - ey * gz) % P == 0


def test_point_add_lm_parity():
    n = 32
    p = _rand_points(n, seed=1)
    q = _rand_points(n, seed=2)
    out = pm.point_add_lm(pm.pack_points_lm(p), pm.pack_points_lm(q),
                          interpret=True)
    from zkvm_tpu.kernels.limbs import limbs_to_field_ints
    gx = limbs_to_field_ints(np.asarray(out.x).T)
    gy = limbs_to_field_ints(np.asarray(out.y).T)
    gz = limbs_to_field_ints(np.asarray(out.z).T)
    gt = limbs_to_field_ints(np.asarray(out.t).T)
    for i in range(n):
        e = oe.add(p[i], q[i])
        _assert_proj_eq((gx[i], gy[i], gz[i], gt[i]), e)
        assert (gt[i] * gz[i] - gx[i] * gy[i]) % P == 0  # T invariant


def test_seg_combine_lm_select():
    """Flagged lanes pass q through; unflagged lanes hold p + q."""
    n = 8
    p = _rand_points(n, seed=3)
    q = _rand_points(n, seed=4)
    flags = jnp.asarray(
        np.array([1, 0, 1, 0, 0, 1, 0, 0], np.int32).reshape(1, n)
    )
    out = pm.seg_combine_lm(pm.pack_points_lm(p), pm.pack_points_lm(q),
                            flags, interpret=True)
    from zkvm_tpu.kernels.limbs import limbs_to_field_ints
    gx = limbs_to_field_ints(np.asarray(out.x).T)
    gy = limbs_to_field_ints(np.asarray(out.y).T)
    gz = limbs_to_field_ints(np.asarray(out.z).T)
    for i in range(n):
        e = q[i] if int(flags[0, i]) else oe.add(p[i], q[i])
        _assert_proj_eq((gx[i], gy[i], gz[i], None), e)


@pytest.mark.parametrize("n,wbits,nbits", [(5, 8, 32), (70, 8, 32)])
@pytest.mark.heavy
def test_msm_pallas_parity(n, wbits, nbits):
    r = random.Random(n)
    pts = _rand_points(n, seed=n)
    ks = [r.randrange(1 << (nbits - 2)) for _ in range(n)]
    ks[0] = 0                         # zero scalar contributes nothing
    ks[1] = (1 << (nbits - 2)) - 1    # near-max digit path
    expect = oe.multiscalar_mul(ks, pts)
    got = pm.msm(pts, ks, wbits=wbits, interpret=True, nbits=nbits)
    _assert_proj_eq(got, expect)


@pytest.mark.heavy
def test_msm_pallas_duplicate_points_and_negation():
    """Duplicate base points (shared buckets) + digits hitting the signed
    boundary -2^(w-1)."""
    r = random.Random(9)
    base = _rand_points(4, seed=11)
    pts = [base[i % 4] for i in range(24)]
    # scalar 0x80 in wbits=8 recodes to digit -128 with a carry into the
    # next window: exercises bucket nbuckets and the negation path
    ks = [0x80, 0x8080, 0x7F7F] + [r.randrange(1 << 30) for _ in range(21)]
    expect = oe.multiscalar_mul(ks, pts)
    got = pm.msm(pts, ks, wbits=8, interpret=True, nbits=32)
    _assert_proj_eq(got, expect)


@pytest.mark.heavy
def test_msm_pallas_unrolled_combine_matches():
    """The TPU (unrolled) window combine must agree with the rolled one."""
    n = 20
    r = random.Random(5)
    pts = _rand_points(n, seed=5)
    ks = [r.randrange(1 << 30) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(ks, 8, 32))
    pb, digits = pm.pad_batch_lm(pm.pack_points_lm(pts), digits)
    rolled = pm.msm_pallas(pb, digits, 8, True, False)
    unrolled = pm.msm_pallas(pb, digits, 8, True, True)
    from zkvm_tpu.kernels import point as jp
    a = jp.unpack_points(jp.PointBatch(
        rolled.x[None], rolled.y[None], rolled.z[None], rolled.t[None]))[0]
    b = jp.unpack_points(jp.PointBatch(
        unrolled.x[None], unrolled.y[None], unrolled.z[None],
        unrolled.t[None]))[0]
    _assert_proj_eq(a, b)


@pytest.mark.parametrize("wbits,nw", [(8, 32), (16, 16), (11, 24)])
def test_combine_window_totals_parity(wbits, nw):
    """Host Horner combine == direct sum of 2^(w*wbits) * P_w at full
    256-bit width (wbits=11 makes the top weight exceed l, which the
    exact doubling chain must survive — mod-l folding would not)."""
    pts = _rand_points(nw, seed=nw * 31 + wbits)
    totals = pm.pack_points_lm(pts)
    got = pm.combine_window_totals(totals, wbits)
    expect = oe.IDENTITY
    for w, p in enumerate(pts):
        expect = oe.add(expect, oe.scalar_mul(1 << (w * wbits), p))
    _assert_proj_eq(got, expect)
    # the pure-oracle fallback path must agree with whatever ran above
    acc = pts[-1]
    for w in range(nw - 2, -1, -1):
        for _ in range(wbits):
            acc = oe.double(acc)
        acc = oe.add(acc, pts[w])
    _assert_proj_eq(acc, expect)


@pytest.mark.parametrize("wbits,nw", [(8, 32), (13, 20), (16, 16)])
def test_combine_and_check_device_parity(wbits, nw):
    """Device rolled Horner combine + identity test == host combine +
    oracle is_identity, on both an identity-summing and a random total
    set (VERDICT r3 #3)."""
    # random totals: combined point is (overwhelmingly) NOT the identity
    pts = _rand_points(nw, seed=nw * 7 + wbits)
    packed = np.stack([
        np.asarray(c) for c in pm.pack_points_lm(pts)
    ])
    host = ristretto.RistrettoPoint(
        pm.combine_window_totals(packed, wbits)).is_identity()
    dev = bool(int(pm.combine_and_check_device(packed, wbits)))
    assert dev == host == False  # noqa: E712

    # identity-summing totals: put -(sum 2^(w*wbits) * P_w) + P_0 in
    # window 0 so the Horner fold lands exactly on the identity
    total = oe.IDENTITY
    for w, p in enumerate(pts):
        total = oe.add(total, oe.scalar_mul(1 << (w * wbits), p))
    fix = oe.add(oe.neg(total), pts[0])
    packed_id = np.stack([
        np.asarray(c) for c in pm.pack_points_lm([fix] + pts[1:])
    ])
    host = ristretto.RistrettoPoint(
        pm.combine_window_totals(packed_id, wbits)).is_identity()
    dev = bool(int(pm.combine_and_check_device(packed_id, wbits)))
    assert dev == host == True  # noqa: E712


def test_horner_fold_kernel_parity():
    """The fused Pallas Horner kernel (interpret mode) == the host combine
    at small width (the real-device path of _combine_check_core)."""
    wbits, nw = 8, 4
    pts = _rand_points(nw, seed=404)
    packed = np.stack([np.asarray(c) for c in pm.pack_points_lm(pts)])
    x, y, z, t = pm.horner_fold_device(
        jnp.asarray(packed), wbits, interpret=True)
    from zkvm_tpu.kernels.limbs import limbs_to_int
    got = tuple(limbs_to_int(np.asarray(c[:, 0])) for c in (x, y, z, t))
    expect = pm.combine_window_totals(packed, wbits)
    _assert_proj_eq(got, expect)

    # identity detection: an identity-summing total set folds to x == 0
    total = oe.IDENTITY
    for w, p in enumerate(pts):
        total = oe.add(total, oe.scalar_mul(1 << (w * wbits), p))
    fix = oe.add(oe.neg(total), pts[0])
    packed_id = np.stack([
        np.asarray(c) for c in pm.pack_points_lm([fix] + pts[1:])])
    x2, y2, _, _ = pm.horner_fold_device(
        jnp.asarray(packed_id), wbits, interpret=True)
    from zkvm_tpu.kernels import field as F
    assert bool(np.asarray(F.is_zero(np.asarray(x2[:, 0])))) or \
        bool(np.asarray(F.is_zero(np.asarray(y2[:, 0]))))


@pytest.mark.heavy
def test_msm_split_path_full_width():
    """window_totals + combine at full 256-bit scalars (the production
    path), small n so interpret mode stays fast."""
    n = 6
    r = random.Random(77)
    pts = _rand_points(n, seed=77)
    ks = [r.randrange(L) for _ in range(n)]
    expect = oe.multiscalar_mul(ks, pts)
    got = pm.msm(pts, ks, wbits=16, interpret=True)
    _assert_proj_eq(got, expect)


def test_best_wbits_monotone():
    ws = [pm.best_wbits(1 << k) for k in (8, 12, 14, 16, 18, 20)]
    assert all(8 <= w <= 20 for w in ws)
    assert ws == sorted(ws), "window width should grow with n"


def test_signed_digits_nbits_truncation():
    ks = [0, 1, (1 << 30) - 1, 12345678]
    d = jmsm.signed_digits_radix_2w(ks, 8, 32)
    assert d.shape == (4, 4)
    for j, k in enumerate(ks):
        assert sum(int(d[j, i]) << (8 * i) for i in range(4)) == k


@pytest.mark.parametrize("wbits", [8, 9])
@pytest.mark.heavy
def test_seq_pipeline_end_to_end(wbits):
    """The sequential-chunk bucket pipeline (production path for
    n >= SEQ_LANES*SEQ_BLOCK) end-to-end vs the oracle at n=4096 — covers
    the in-kernel K-chunk scan, cross-lane roll-scan, fixup, scatter, and
    two-stage weighted fold, none of which the small-n tests reach.
    wbits=9 gives nw=29: a ragged lane-scan window grid (29 % 8 != 0) and a
    fold lane tile that must drop below FOLD_TILE (29*128 % 512 != 0).

    Runs in a SUBPROCESS: the XLA CPU compiler intermittently segfaults on
    this interpret-mode graph when other large compiles preceded it in the
    same process (same flake as test_msm_vectorized_variant_parity; passes
    reliably in isolation)."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import random
        from zkvm_tpu.constants import L, P
        from zkvm_tpu.kernels import pallas_msm as pm
        from zkvm_tpu.oracle import edwards as oe
        from zkvm_tpu.oracle.ristretto import RistrettoPoint

        WBITS = {wbits}
        n = pm.SEQ_LANES * pm.SEQ_BLOCK
        r = random.Random(99)
        rr = random.Random(99)
        base = [RistrettoPoint.from_uniform_bytes(
            rr.getrandbits(512).to_bytes(64, "little")).ep
            for _ in range(64)]
        pts = [base[i % 64] for i in range(n)]
        ks = [r.randrange(L) for _ in range(n)]
        expect = oe.multiscalar_mul(ks, pts)
        got = pm.msm(pts, ks, wbits=WBITS, interpret=True)
        gx, gy, gz, _ = got
        ex, ey, ez, _ = expect
        assert (gx * ez - ex * gz) % P == 0
        assert (gy * ez - ey * gz) % P == 0
        print("SEQ-PIPELINE-OK")
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    assert res.returncode == 0 and "SEQ-PIPELINE-OK" in res.stdout, (
        res.stderr[-2000:]
    )


# ------------------------------------------------------------ v5 frontend
def test_sort_rows_device_parity():
    """Pallas bitonic row sort vs np.sort: non-pow2 columns (sentinel
    padding), rows not a multiple of the sublane block, and values spanning
    the full nonnegative packed-key range."""
    r = np.random.RandomState(7)
    for shape in [(3, 1000), (8, 4096), (20, 513), (1, 16)]:
        x = r.randint(0, 2**31 - 1, size=shape, dtype=np.int64).astype(
            np.int32)
        got = np.asarray(pm.sort_rows_device(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x, axis=1))


def test_encode_decode_words_roundtrip():
    """encode_words_lm must be the exact inverse of decode_words_lm on
    canonical limbs, and match the little-endian integer packing."""
    from zkvm_tpu.kernels.limbs import int_to_limbs

    r = random.Random(11)
    vals = [r.randrange(P) for _ in range(64)] + [0, 1, P - 1]
    limbs = jnp.asarray(
        np.stack([int_to_limbs(v) for v in vals]).T.astype(np.int32))
    words = pm.encode_words_lm(limbs)                       # (8, n)
    back = pm.decode_words_lm(words)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(limbs))
    w_np = np.asarray(words)
    for i, v in enumerate(vals):
        got = int.from_bytes(w_np[:, i].tobytes(), "little")
        assert got == v, (i, v, got)


def test_normalize_lm_loose_input():
    """normalize_lm reduces loose (sum/negated) limb vectors to the
    canonical representative mod p."""
    from zkvm_tpu.kernels.limbs import int_to_limbs

    r = random.Random(13)
    vals = [r.randrange(P) for _ in range(8)]
    loose = np.stack([int_to_limbs(v) for v in vals]).T.astype(np.int32)
    loose = loose * 3 - 2 * np.asarray(
        np.stack([int_to_limbs(v) for v in vals]).T, np.int32)  # == v, loose
    loose[:, :4] += np.asarray(int_to_limbs(P))[:, None]        # v + p
    out = np.asarray(pm.normalize_lm(jnp.asarray(loose)))
    for i, v in enumerate(vals):
        got = sum(int(out[j, i]) << (13 * j) for j in range(out.shape[0]))
        assert got == v % P
        assert (out[:, i] >= 0).all() and (out[:, i] < (1 << 13)).all()


def test_gather_rows_words_parity():
    r = np.random.RandomState(3)
    src = r.randint(-2**31, 2**31 - 1, size=(32, 256),
                    dtype=np.int64).astype(np.int32)
    perm = np.stack([r.permutation(256) for _ in range(5)]).astype(np.int32)
    got = np.asarray(pm.gather_rows_words(
        jnp.asarray(src), jnp.asarray(perm), interpret=True))
    expect = np.stack([src[:, perm[w]] for w in range(5)])
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("wbits", [8])
@pytest.mark.heavy
def test_seq_pipeline_words_path(wbits):
    """The v5 frontend (Pallas bitonic sort + words gather + in-kernel
    decode/cneg scan) end-to-end vs the oracle at the production tile size
    (subprocess for the same XLA-CPU flake as test_seq_pipeline_end_to_end;
    env forces the Pallas stages, which default off in interpret mode)."""
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import random
        from zkvm_tpu.constants import L, P
        from zkvm_tpu.kernels import pallas_msm as pm
        from zkvm_tpu.oracle import edwards as oe
        from zkvm_tpu.oracle.ristretto import RistrettoPoint

        WBITS = {wbits}
        n = pm.SEQ_LANES * pm.SEQ_BLOCK
        r = random.Random(99)
        rr = random.Random(99)
        base = [RistrettoPoint.from_uniform_bytes(
            rr.getrandbits(512).to_bytes(64, "little")).ep
            for _ in range(64)]
        pts = [base[i % 64] for i in range(n)]
        ks = [r.randrange(L) for _ in range(n)]
        expect = oe.multiscalar_mul(ks, pts)
        got = pm.msm(pts, ks, wbits=WBITS, interpret=True)
        gx, gy, gz, _ = got
        ex, ey, ez, _ = expect
        assert (gx * ez - ex * gz) % P == 0
        assert (gy * ez - ey * gz) % P == 0
        print("SEQ-WORDS-OK")
    """)
    env = dict(os.environ)
    env["ZKVM_MSM_SORT"] = "pallas"
    env["ZKVM_MSM_GATHER"] = "pallas"
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200, env=env,
    )
    assert res.returncode == 0 and "SEQ-WORDS-OK" in res.stdout, (
        res.stderr[-2000:]
    )


# ------------------------------------------------ affine-gather helpers
def test_mul_lm_parity():
    """XLA-level limb-major mul vs oracle field mul on random elements."""
    from zkvm_tpu.kernels.limbs import int_to_limbs, limbs_to_int
    r = random.Random(5)
    xs = [r.randrange(P) for _ in range(16)]
    ys = [r.randrange(P) for _ in range(16)]
    a = jnp.stack([jnp.asarray(int_to_limbs(x)) for x in xs], axis=1)
    b = jnp.stack([jnp.asarray(int_to_limbs(y)) for y in ys], axis=1)
    out = np.asarray(pm.mul_lm(a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert limbs_to_int(out[:, i]) % P == x * y % P


def test_batch_zinv_lm_parity():
    from zkvm_tpu.kernels.limbs import int_to_limbs, limbs_to_int
    r = random.Random(6)
    zs = [r.randrange(1, P) for _ in range(24)]
    z = jnp.stack([jnp.asarray(int_to_limbs(x)) for x in zs], axis=1)
    out = np.asarray(pm.batch_zinv_lm(z))
    for i, x in enumerate(zs):
        assert limbs_to_int(out[:, i]) * x % P == 1


def test_to_affine_words_parity():
    """Affine encodings must round-trip to X/Z, Y/Z of the input points."""
    from zkvm_tpu.kernels.limbs import limbs_to_int
    eps = _rand_points(8, seed=9)
    pts = pm.pack_points_lm(eps)
    words = np.asarray(pm.to_affine_words(pts))  # (16, n) int32 bitcast
    decoded = np.asarray(pm.decode_words_lm(
        jnp.asarray(words[:8].view(np.uint32))))
    decoded_y = np.asarray(pm.decode_words_lm(
        jnp.asarray(words[8:].view(np.uint32))))
    for i, (X, Y, Z, _T) in enumerate(eps):
        zinv = pow(Z, P - 2, P)
        assert limbs_to_int(decoded[:, i]) % P == X * zinv % P
        assert limbs_to_int(decoded_y[:, i]) % P == Y * zinv % P


@pytest.mark.heavy
def test_window_totals_affine_parity(monkeypatch):
    """Full pipeline with the affine gather (opt-in env) vs the oracle,
    interpret mode."""
    import subprocess
    import sys
    code = """
import os, random, sys
os.environ["ZKVM_MSM_AFFINE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
import jax.numpy as jnp
from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle import ristretto
from zkvm_tpu.oracle.edwards import scalar_mul, add as point_add, IDENTITY
r = random.Random(3)
n, wbits = 4096, 8
eps = [ristretto.RistrettoPoint.from_uniform_bytes(
    r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(64)]
pts0 = pm.pack_points_lm(eps)
reps = n // 64
pts = pm.PointBatch(*(jnp.tile(c, (1, reps)) for c in pts0))
scalars = [r.randrange(1 << 15) for _ in range(n)]
digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, wbits, 24))
got = pm.combine_window_totals(
    pm.window_totals_packed(pts, digits, wbits, True), wbits)
want = IDENTITY
for i, s in enumerate(scalars):
    want = point_add(want, scalar_mul(s, eps[i %% 64]))
assert (got[0] * want[2] - want[0] * got[2]) %% P == 0
assert (got[1] * want[2] - want[1] * got[2]) %% P == 0
print("OK")
""" % (str(__import__("pathlib").Path(__file__).resolve().parents[1]),)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=1500)
    assert "OK" in out.stdout, out.stderr[-2000:]
