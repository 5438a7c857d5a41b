"""Fused device batch-verification path (kernels/batch_verify_device.py):
digit machinery round trips, scalar-synthesis parity vs the host ground
truth, end-to-end accept/reject, and the resident generator cache.

Upstream semantics under test: range_proof/mod.rs verify_multiple +
inner_product_proof.rs verification_scalars (the s-vector / g/h columns).
"""

import random

import numpy as np
import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.kernels import scalarmod as sm
from zkvm_tpu.kernels.limbs import ints_to_limbs, limbs_to_int
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.rangeproof import RangeProof
from zkvm_tpu.proofs.transcript import ProofTranscript

PC_GENS = PedersenGens()
BP_GENS = BulletproofGens(64, 4)


def test_signed_digits13_roundtrip(rng):
    import jax.numpy as jnp
    vals = ([rng.randrange(1 << 260) for _ in range(32)]
            + [0, 1, L - 1, L, 2 * L, (1 << 260) - 1, 1 << 252, (1 << 253) + 5])
    limbs = jnp.asarray(ints_to_limbs(vals))
    digits = np.asarray(sm.signed_digits13(limbs))
    assert digits.min() >= -(1 << 12) and digits.max() < (1 << 12)
    for v, row in zip(vals, digits):
        got = sum(int(d) << (13 * i) for i, d in enumerate(row))
        assert got % L == v % L


def test_signed_digits13_loose_overflow(rng):
    """Loose mul/accumulate outputs can exceed 2^260 by a sliver (limbs
    carry-tight at ~2^13+17); the recode must retain the final ripple carry
    instead of silently dropping value mod 2^260."""
    import jax.numpy as jnp
    rows = [np.full(20, (1 << 13) + 17, np.int32)]        # ~1.002 * 2^260
    for _ in range(16):
        rows.append(np.asarray(
            [rng.randrange(0, (1 << 13) + 18) for _ in range(20)], np.int32))
    loose = np.stack(rows)
    digits = np.asarray(sm.signed_digits13(jnp.asarray(loose)))
    for row_in, row_out in zip(loose, digits):
        want = sum(int(v) << (13 * i) for i, v in enumerate(row_in)) % L
        got = sum(int(d) << (13 * i) for i, d in enumerate(row_out)) % L
        assert got == want


def test_digits_to_words_roundtrip(rng):
    import jax.numpy as jnp
    vals = [rng.randrange(1 << 260) for _ in range(16)] + [0, L - 1, L + 7]
    limbs = jnp.asarray(ints_to_limbs(vals))
    d = sm.partial_reduce_digits(limbs)
    words = np.asarray(sm.digits_to_words(d))
    for v, row in zip(vals, words):
        got = sum(int(w) << (32 * k) for k, w in enumerate(row))
        assert got % L == v % L
        assert got < 1 << 254


def test_synthesize_parity(rng):
    """Device scalar synthesis == the host g/h/head formulas, per proof and
    accumulated (the verification_scalars ground truth)."""
    import jax.numpy as jnp

    from zkvm_tpu.kernels.batch_verify_device import (
        _synthesize, pack_verification_params,
    )
    from zkvm_tpu.oracle import scalar

    n, m, nb = 8, 2, 3
    nm, lg = n * m, 4
    jobs, expected_g, expected_h, expected_dyn = [], [0] * nm, [0] * nm, []
    for _ in range(nb):
        y = rng.randrange(1, L)
        z = rng.randrange(1, L)
        x = rng.randrange(1, L)
        c = rng.randrange(1, L)
        a = rng.randrange(L)
        b = rng.randrange(L)
        wt = rng.randrange(1, L)
        u = [rng.randrange(1, L) for _ in range(lg)]
        u_inv = scalar.batch_invert(u)
        allinv = 1
        for ui in u_inv:
            allinv = allinv * ui % L
        zz = z * z % L
        jobs.append({
            "wz": wt * z % L, "wz_neg": (-wt * z) % L,
            "wa_neg": (-wt * a) % L, "wzz": wt * zz % L,
            "wb_neg": (-wt * b) % L, "y_inv": scalar.invert(y), "z": z,
            "allinv": allinv, "wt": wt, "wt_x": wt * x % L,
            "wt_cx": wt * c % L * x % L,
            "wt_cxx": wt * c % L * x % L * x % L,
            "wczz": wt * c % L * zz % L,
            "u_sq": [ui * ui % L for ui in u],
            "u_inv_sq": [ui * ui % L for ui in u_inv],
        })
        # host ground truth: s expansion, g/h columns, head scalars
        s = [allinv]
        for j in range(lg):
            s += [si * (u[lg - 1 - j] ** 2) % L for si in s[: 1 << j]]
        assert len(s) == nm
        y_inv = scalar.invert(y)
        for i in range(nm):
            gi = (-z - a * s[i]) % L
            z2 = pow(z, i // n, L) * (1 << (i % n)) % L
            hi = (z + pow(y_inv, i, L)
                  * ((zz * z2 - b * s[nm - 1 - i]) % L)) % L
            expected_g[i] = (expected_g[i] + wt * gi) % L
            expected_h[i] = (expected_h[i] + wt * hi) % L
        head = ([wt, wt * x % L, wt * c % L * x % L,
                 wt * c % L * x % L * x % L]
                + [wt * ui * ui % L for ui in u]
                + [wt * ui * ui % L for ui in u_inv]
                + [wt * c % L * zz % L * pow(z, j, L) % L for j in range(m)])
        expected_dyn.append([v % L for v in head])

    params = sm.decode_words_last(jnp.asarray(pack_verification_params(jobs)))
    gh, dyn = _synthesize(params, n, m, lg)
    gh = np.asarray(gh)
    dyn = np.asarray(dyn)
    for i in range(nm):
        assert limbs_to_int(gh[i]) % L == expected_g[i]
        assert limbs_to_int(gh[nm + i]) % L == expected_h[i]
    for p in range(nb):
        got = [limbs_to_int(dyn[p, j]) % L for j in range(dyn.shape[1])]
        assert got == expected_dyn[p]


def test_synthesize_lm_matches_last():
    """The limb-major synthesis (COMPACT params, on-device derivation of
    the product channels) must agree value-for-value (mod l) with the
    limbs-last full-layout reference on random base challenges."""
    import jax.numpy as jnp
    import numpy as np

    from zkvm_tpu.kernels.batch_verify_device import (
        _synthesize, _synthesize_lm, pack_verification_params,
        pack_verification_params_compact,
    )
    from zkvm_tpu.kernels.limbs import limbs_to_int
    from zkvm_tpu.oracle import scalar

    r = random.Random(77)
    n, m, lg = 8, 2, 4
    full_jobs, compact_jobs = [], []
    for _ in range(3):
        wt, z, x, c, a, b = (r.randrange(1, L) for _ in range(6))
        y = r.randrange(2, L)
        u = [r.randrange(1, L) for _ in range(lg)]
        u_inv = scalar.batch_invert(u)
        allinv = 1
        for ui in u_inv:
            allinv = allinv * ui % L
        zz = z * z % L
        full_jobs.append({
            "wz": wt * z % L, "wz_neg": (-wt * z) % L,
            "wa_neg": (-wt * a) % L, "wzz": wt * zz % L,
            "wb_neg": (-wt * b) % L, "y_inv": scalar.invert(y), "z": z,
            "allinv": allinv, "wt": wt, "wt_x": wt * x % L,
            "wt_cx": wt * c % L * x % L,
            "wt_cxx": wt * c % L * x % L * x % L,
            "wczz": wt * c % L * zz % L,
            "u_sq": [ui * ui % L for ui in u],
            "u_inv_sq": [ui * ui % L for ui in u_inv],
        })
        compact_jobs.append({
            "wt": wt, "z": z, "y_inv": scalar.invert(y), "allinv": allinv,
            "a": a, "b": b, "x": x, "cx": c * x % L, "czz": c * zz % L,
            "u_sq": [ui * ui % L for ui in u],
        })
    full_w = jnp.asarray(pack_verification_params(full_jobs))
    compact_w = jnp.asarray(pack_verification_params_compact(compact_jobs))
    gh_l, dyn_l = _synthesize(sm.decode_words_last(full_w), n, m, lg)
    gh_m, dyn_m = _synthesize_lm(compact_w, n, m, lg)
    gh_l, dyn_l, gh_m, dyn_m = map(np.asarray, (gh_l, dyn_l, gh_m, dyn_m))
    assert gh_l.shape == gh_m.shape and dyn_l.shape == dyn_m.shape
    for i in range(gh_l.shape[0]):
        assert limbs_to_int(gh_m[i]) % L == limbs_to_int(gh_l[i]) % L, i
    for p in range(dyn_l.shape[0]):
        for j in range(dyn_l.shape[1]):
            assert (limbs_to_int(dyn_m[p, j]) % L
                    == limbs_to_int(dyn_l[p, j]) % L), (p, j)


def _make_proofs(nb: int, n: int, m: int, seed: int):
    r = random.Random(seed)
    proofs, transcripts, vcs = [], [], []
    for _ in range(nb):
        values = [r.randrange(1 << n) for _ in range(m)]
        blindings = [r.randrange(L) for _ in range(m)]
        proof, commitments = RangeProof.prove_multiple(
            BP_GENS, PC_GENS, ProofTranscript(b"fused-batch"),
            values, blindings, n,
        )
        proofs.append(proof)
        transcripts.append(ProofTranscript(b"fused-batch"))
        vcs.append(commitments)
    return proofs, transcripts, vcs


@pytest.mark.parametrize("n,m,nb", [(16, 1, 3), (8, 2, 2), (64, 4, 2)])
@pytest.mark.heavy
def test_batch_verify_device_end_to_end(n, m, nb):
    from zkvm_tpu.kernels.batch_verify_device import batch_verify_device

    proofs, transcripts, vcs = _make_proofs(nb, n, m, seed=n + m)
    assert batch_verify_device(
        proofs, BP_GENS, PC_GENS, transcripts, vcs, n
    )

    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.t_x = (bad.t_x + 1) % L
    assert not batch_verify_device(
        [bad] + proofs[1:], BP_GENS, PC_GENS,
        [ProofTranscript(b"fused-batch") for _ in proofs], vcs, n,
    )


@pytest.mark.heavy
def test_batch_verify_device_dev_combine(monkeypatch):
    """ZKVM_DEV_COMBINE=1 routes through batch_msm_check (device rolled
    Horner combine + on-chip identity test, single int32 fetch); accept and
    reject must match the host-combine ground truth."""
    from zkvm_tpu.kernels.batch_verify_device import batch_verify_device

    monkeypatch.setenv("ZKVM_DEV_COMBINE", "1")
    proofs, transcripts, vcs = _make_proofs(2, 8, 1, seed=17)
    timings: dict = {}
    assert batch_verify_device(
        proofs, BP_GENS, PC_GENS, transcripts, vcs, 8, timings=timings
    )
    assert timings["dev_combine"] is True

    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.e_blinding = (bad.e_blinding + 1) % L
    assert not batch_verify_device(
        [bad] + proofs[1:], BP_GENS, PC_GENS,
        [ProofTranscript(b"fused-batch") for _ in proofs], vcs, 8,
    )


@pytest.mark.heavy
def test_batch_verify_device_decompress_on_device():
    """The dev_decompress variant (Pallas ristretto decode, raw 32-byte
    uploads) must accept valid batches and turn an invalid encoding into a
    clean False via the folded validity flag."""
    from zkvm_tpu.kernels.batch_verify_device import batch_verify_device

    proofs, transcripts, vcs = _make_proofs(2, 8, 1, seed=42)
    assert batch_verify_device(
        proofs, BP_GENS, PC_GENS, transcripts, vcs, 8, dev_decompress=True
    )
    # corrupt one L commitment into a non-canonical encoding (still 32
    # bytes, passes the replay, fails device decode validation)
    from zkvm_tpu.constants import P
    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.ipp_proof.L_vec = list(bad.ipp_proof.L_vec)
    bad.ipp_proof.L_vec[0] = (P + 3).to_bytes(32, "little")
    assert not batch_verify_device(
        [bad] + proofs[1:], BP_GENS, PC_GENS,
        [ProofTranscript(b"fused-batch") for _ in proofs], vcs, 8,
        dev_decompress=True,
    )


def test_static_gens_cache():
    from zkvm_tpu.kernels.batch_verify_device import static_gens_words

    w1 = static_gens_words(BP_GENS, PC_GENS, 8, 1)
    w2 = static_gens_words(BP_GENS, PC_GENS, 8, 1)
    assert w1 is w2  # uploaded once, device-resident
    w3 = static_gens_words(BP_GENS, PC_GENS, 8, 2)
    assert w3 is not w1 and w3.shape == (4, 8, 2 + 2 * 16)


@pytest.mark.heavy
def test_jax_engine_routes_batch_verify():
    """batch_verify through the installed JaxEngine must take the fused
    path (and still reject a tampered batch)."""
    from zkvm_tpu.kernels.engine import JaxEngine
    from zkvm_tpu.proofs.engine import set_engine
    from zkvm_tpu.proofs.errors import ProofError
    from zkvm_tpu.proofs.rangeproof import batch_verify

    proofs, transcripts, vcs = _make_proofs(2, 16, 1, seed=9)
    prev = set_engine(JaxEngine(pipeline="pallas"))
    try:
        batch_verify(proofs, BP_GENS, PC_GENS, transcripts, vcs, 16)
        bad = RangeProof.from_bytes(proofs[0].to_bytes())
        bad.e_blinding = (bad.e_blinding + 1) % L
        with pytest.raises(ProofError):
            batch_verify(
                [bad] + proofs[1:], BP_GENS, PC_GENS,
                [ProofTranscript(b"fused-batch") for _ in proofs], vcs, 16,
            )
    finally:
        set_engine(prev)


@pytest.mark.parametrize("n,m,nb", [(16, 1, 3), (8, 2, 2), (64, 4, 2)])
def test_fused_params_native_vs_python(n, m, nb, monkeypatch):
    """The native whole-batch params assembly (scalarvec.cpp
    fused_params_assembly) must agree bit-for-bit with the Python chain it
    replaces (params channels, weighted bbB rows, dyn words)."""
    from zkvm_tpu.kernels.batch_verify_device import prepare_batch_inputs

    proofs, transcripts, vcs = _make_proofs(nb, n, m, seed=7 * n + m)

    def run():
        return prepare_batch_inputs(
            proofs, BP_GENS, PC_GENS,
            [ProofTranscript(b"fused-batch") for _ in proofs], vcs, n,
        )

    native = run()
    monkeypatch.setenv("ZKVM_TPU_PY_PARAMS", "1")
    pure = run()
    for a, b in zip(native[:3], pure[:3]):
        np.testing.assert_array_equal(a, b)
    assert native[3:] == pure[3:]


def test_prepare_batch_threaded_replay_parity(monkeypatch):
    """ZKVM_HOST_THREADS>1 routes transcript replays through a thread pool
    (nb >= 64); output must be bit-identical to the sequential path AND to
    the ZKVM_TPU_PY_PARAMS pure-Python ground truth (ADVICE r3 #2)."""
    from zkvm_tpu.kernels.batch_verify_device import prepare_batch_inputs

    proofs, _, vcs = _make_proofs(64, 8, 1, seed=21)

    def run():
        return prepare_batch_inputs(
            proofs, BP_GENS, PC_GENS,
            [ProofTranscript(b"fused-batch") for _ in proofs], vcs, 8,
        )

    sequential = run()
    monkeypatch.setenv("ZKVM_HOST_THREADS", "4")
    threaded = run()
    monkeypatch.setenv("ZKVM_TPU_PY_PARAMS", "1")
    pure = run()
    for a, b, c in zip(sequential[:3], threaded[:3], pure[:3]):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
    assert sequential[3:] == threaded[3:] == pure[3:]


@pytest.mark.heavy
def test_batch_verify_pipelined_matches_sequential():
    """The overlapped serving path must return exactly what the one-shot
    path returns per batch, including a corrupted batch -> False."""
    from zkvm_tpu.kernels.batch_verify_device import (
        batch_verify_device, batch_verify_device_pipelined,
    )

    proofs, _, vcs = _make_proofs(2, 8, 1, seed=3)
    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.t_x = (bad.t_x + 1) % L

    def fresh(ps):
        return (ps, [ProofTranscript(b"fused-batch") for _ in ps], vcs)

    batches = [fresh(proofs), fresh([bad, proofs[1]]), fresh(proofs)]
    got = batch_verify_device_pipelined(batches, BP_GENS, PC_GENS, 8)
    assert got == [True, False, True]
    for ps, ts, v in [fresh(proofs)]:
        assert batch_verify_device(ps, BP_GENS, PC_GENS, ts, v, 8)


@pytest.mark.parametrize("n,m", [(64, 4), (32, 2)])
@pytest.mark.heavy
def test_fused_aggregated_matches_host_engine(n, m):
    """Aggregated proofs (m > 1) through the FUSED path must agree with the
    host-assembled combined MSM (batch_verification_job + oracle engine) on
    both accept and reject (VERDICT r4 task 9; upstream verify_multiple
    m-aggregation, range_proof/mod.rs)."""
    from zkvm_tpu.kernels.batch_verify_device import batch_verify_device
    from zkvm_tpu.proofs.engine import get_engine
    from zkvm_tpu.proofs.rangeproof import batch_verification_job

    proofs, transcripts, vcs = _make_proofs(2, n, m, seed=31 * n + m)

    def host_ok(ps, vs):
        scalars, points = batch_verification_job(
            ps, BP_GENS, PC_GENS,
            [ProofTranscript(b"fused-batch") for _ in ps], vs, n,
        )
        return get_engine().msm_is_identity(scalars, points)

    assert batch_verify_device(
        proofs, BP_GENS, PC_GENS, transcripts, vcs, n)
    assert host_ok(proofs, vcs)

    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.t_x = (bad.t_x + 1) % L
    bad_batch = [bad, proofs[1]]
    assert not batch_verify_device(
        bad_batch, BP_GENS, PC_GENS,
        [ProofTranscript(b"fused-batch") for _ in proofs], vcs, n)
    assert not host_ok(bad_batch, vcs)
