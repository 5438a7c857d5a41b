"""Native (C++) host modules, loaded via ctypes.

Built lazily with the system compiler on first import (no pybind11 in this
image); falls back silently so the pure-Python oracle remains authoritative.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    here = os.path.dirname(__file__)
    srcs = [os.path.join(here, "strobe.cpp"),
            os.path.join(here, "ristretto255.cpp"),
            os.path.join(here, "scalarvec.cpp"),
            os.path.join(here, "edwards255.cpp"),
            os.path.join(here, "ipp_create.cpp")]
    hdrs = [os.path.join(here, "field51.h")]
    build_dir = os.path.join(here, "build")
    so_path = os.path.join(build_dir, "libzkvmnative.so")
    if not os.path.exists(so_path) or any(
        os.path.getmtime(so_path) < os.path.getmtime(s) for s in srcs + hdrs
    ):
        os.makedirs(build_dir, exist_ok=True)
        subprocess.run(
            ["c++", "-O3", "-march=native", "-pthread", "-shared", "-fPIC",
             "-o", so_path] + srcs,
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so_path)
    lib.strobe_sizeof.restype = ctypes.c_int
    lib.strobe_init.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t
    ]
    for name in ("strobe_meta_ad", "strobe_ad", "strobe_key"):
        getattr(lib, name).argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int
        ]
    lib.strobe_prf.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int
    ]
    lib.keccak_f1600.argtypes = [ctypes.c_char_p]
    lib.strobe_append_message.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.strobe_challenge_bytes.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.ristretto_set_constants.argtypes = [ctypes.c_char_p] * 3
    lib.ristretto_decompress_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p
    ]
    lib.ristretto_compress_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
    ]
    from ..constants import EDWARDS_D, INVSQRT_A_MINUS_D, SQRT_M1
    lib.ristretto_set_constants(
        EDWARDS_D.to_bytes(32, "little"),
        SQRT_M1.to_bytes(32, "little"),
        INVSQRT_A_MINUS_D.to_bytes(32, "little"),
    )
    lib.scl_set_constants.argtypes = [ctypes.c_char_p] * 3
    for name in ("scl_mul", "scl_add", "scl_sub", "scl_inner"):
        getattr(lib, name).argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
        ]
    lib.scl_mul_scalar.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
    ]
    for name in ("scl_neg", "scl_sum", "scl_batch_invert"):
        getattr(lib, name).argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
        ]
    lib.scl_powers.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
    for name in ("scl_axpb", "scl_muladd"):
        getattr(lib, name).argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p,
        ]
    lib.scl_flatten.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    from ..constants import L
    lib.scl_set_constants(
        L.to_bytes(32, "little"),
        pow(2, 512, L).to_bytes(32, "little"),
        (L - 2).to_bytes(32, "little"),
    )
    lib.ed_set_constants.argtypes = [ctypes.c_char_p]
    lib.ed_msm.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p,
    ]
    lib.ed_fold.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ed_add_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
    ]
    lib.ed_bit_commit.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ed_fixed_init.argtypes = [ctypes.c_int, ctypes.c_char_p]
    lib.ed_fixed_ready.argtypes = [ctypes.c_int]
    lib.ed_fixed_ready.restype = ctypes.c_int
    lib.ed_fixed_mul.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p
    ]
    lib.ed_fixed_commit_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.ed_combine_windows.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p
    ]
    lib.rangeproof_replay.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p,
    ]
    lib.rangeproof_replay.restype = ctypes.c_int
    lib.rangeproof_replay_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sv_from_wide.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.scl_from_wide.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
    lib.rangeproof_scalar_assembly.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.rangeproof_scalar_assembly.restype = ctypes.c_int
    lib.fused_params_assembly.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.fused_params_assembly.restype = ctypes.c_int
    lib.ipp_create.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
    ]
    lib.ipp_create.restype = ctypes.c_int
    lib.ed_ipp_ctx_new.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int
    ]
    lib.ed_ipp_ctx_new.restype = ctypes.c_void_p
    lib.ed_ipp_ctx_free.argtypes = [ctypes.c_void_p]
    from ..constants import EDWARDS_D2
    lib.ed_set_constants(EDWARDS_D2.to_bytes(32, "little"))
    return lib


def get_lib():
    """The native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            if os.environ.get("ZKVM_TPU_NO_NATIVE"):
                return None
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib


class NativeStrobe128:
    """ctypes-backed Strobe128 with the same API as the oracle class."""

    __slots__ = ("_buf", "_lib")

    def __init__(self, protocol_label: bytes, _copy_from=None):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self._buf = ctypes.create_string_buffer(lib.strobe_sizeof())
        if _copy_from is None:
            lib.strobe_init(self._buf, protocol_label, len(protocol_label))
        else:
            ctypes.memmove(self._buf, _copy_from._buf, lib.strobe_sizeof())

    def clone(self) -> "NativeStrobe128":
        return NativeStrobe128(b"", _copy_from=self)

    def meta_ad(self, data: bytes, more: bool):
        self._lib.strobe_meta_ad(self._buf, data, len(data), int(more))

    def ad(self, data: bytes, more: bool):
        self._lib.strobe_ad(self._buf, data, len(data), int(more))

    def prf(self, n: int, more: bool) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._lib.strobe_prf(self._buf, out, n, int(more))
        return out.raw

    def key(self, data: bytes, more: bool):
        self._lib.strobe_key(self._buf, data, len(data), int(more))

    # fused Merlin ops (one ctypes crossing instead of three)
    def append_message(self, label: bytes, message: bytes):
        self._lib.strobe_append_message(
            self._buf, label, len(label), message, len(message)
        )

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._lib.strobe_challenge_bytes(self._buf, label, len(label), out, n)
        return out.raw


def make_strobe(protocol_label: bytes):
    """Factory: native when available, else the pure-Python oracle."""
    if get_lib() is not None:
        return NativeStrobe128(protocol_label)
    from ..oracle.strobe import Strobe128
    return Strobe128(protocol_label)


def decompress_batch_raw(encodings: bytes, n: int):
    """n 32-byte Ristretto encodings -> (coords bytes: n*128, ok: n bytes)
    via the native library, or None when it is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(128 * n)
    ok = ctypes.create_string_buffer(n)
    lib.ristretto_decompress_batch(encodings, n, out, ok)
    return out.raw, ok.raw


def compress_batch_raw(coords: bytes, n: int):
    """n extended points (X,Y,Z,T as 32-byte LE each) -> n 32-byte
    encodings, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32 * n)
    lib.ristretto_compress_batch(coords, n, out)
    return out.raw


def _pack_points(points) -> bytes:
    """Oracle extended points -> concatenated 128-byte blobs."""
    from ..constants import P
    return b"".join(
        (c % P).to_bytes(32, "little") for ep in points for c in ep
    )


# packed-blob cache for LARGE repeated point vectors (the R1CS/rangeproof
# commitment bases [B_blinding] + G + H are slices of BulletproofGens'
# cached vectors — stable object identities; ~0.1 s of int.to_bytes per
# 131k-point pack otherwise).  Strong refs pin the keyed endpoints.
_PACK_CACHE: "dict[tuple, tuple]" = {}
_PACK_CACHE_MAX = 8


def _pack_points_cached(points) -> bytes:
    if len(points) < 1024:
        return _pack_points(points)
    # key on EVERY element id (an id tuple is ~1000x cheaper than the
    # pack it avoids); endpoint-only keys could alias two vectors that
    # share endpoints but differ in the interior
    key = tuple(map(id, points))
    hit = _PACK_CACHE.get(key)
    if hit is not None:
        return hit[0]
    blob = _pack_points(points)
    if len(_PACK_CACHE) >= _PACK_CACHE_MAX:
        _PACK_CACHE.popitem()
    _PACK_CACHE[key] = (blob, tuple(points))
    return blob


def _unpack_point(blob: bytes, i: int = 0):
    o = blob[128 * i: 128 * (i + 1)]
    return (
        int.from_bytes(o[0:32], "little"),
        int.from_bytes(o[32:64], "little"),
        int.from_bytes(o[64:96], "little"),
        int.from_bytes(o[96:128], "little"),
    )


def ed_msm(scalars, points, ct: bool = False):
    """sum s_i * P_i over oracle extended points via native Straus, or None
    when the library is unavailable.  ct=True for secret scalars.
    `scalars` may be a ScalarVec (used as its packed buffer, zero-copy)."""
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    n = len(points)
    if isinstance(scalars, ScalarVec):
        assert len(scalars) == n
        sbuf = scalars.buf
    else:
        sbuf = b"".join(
            (int(s) % L).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(128)
    lib.ed_msm(sbuf, _pack_points_cached(points), n, int(ct), out)
    return _unpack_point(out.raw)


def ed_combine_windows(points, wbits: int):
    """Horner fold sum_w 2^(w*wbits) * points[w] (exact doubling chain, no
    mod-l), or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(128)
    lib.ed_combine_windows(_pack_points(points), len(points), wbits, out)
    return _unpack_point(out.raw)


def ed_bit_commit(blind: int, Bb_ep, bits, G_eps, H_eps):
    """blind*Bb + sum_i (bits[i] ? G_i : -H_i) — the range-proof
    A-commitment (a_L bits / a_R = a_L - 1 structure collapses the ct MSM
    to one fixed ladder + n ct selects; edwards255.cpp ed_bit_commit).
    Returns the extended point tuple, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    n = len(bits)
    assert len(G_eps) == len(H_eps) == n
    out = ctypes.create_string_buffer(128)
    lib.ed_bit_commit(
        (int(blind) % L).to_bytes(32, "little"), _pack_points([Bb_ep]),
        bytes(int(b) & 1 for b in bits),
        _pack_points(G_eps), _pack_points(H_eps), n, out,
    )
    return _unpack_point(out.raw)


def ed_fold(s1, s2, P, Q, ct: bool = False):
    """[s1_i*P_i + s2_i*Q_i] (the IPP fold), or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    n = len(P)
    assert len(s1) == len(s2) == n == len(Q)
    b1 = b"".join((int(s) % L).to_bytes(32, "little") for s in s1)
    b2 = b"".join((int(s) % L).to_bytes(32, "little") for s in s2)
    out = ctypes.create_string_buffer(128 * n)
    lib.ed_fold(b1, b2, _pack_points(P), _pack_points(Q), n, int(ct), out)
    return [_unpack_point(out.raw, i) for i in range(n)]


# prebuilt IPP w-NAF generator tables (ed_ipp_ctx_new), keyed by the
# IDENTITY of the generator point objects — BulletproofGens returns slices
# of its cached G_vec/H_vec lists, so the endpoints pin the exact vector.
# The cache holds strong refs to the keyed points so ids can't be reused.
# Thread-safe: MPC ranks prove on Python threads, so the dict is guarded
# by a lock and evicted ctxs are parked (never freed) — a concurrent
# prover may still be inside lib.ipp_create with the evicted tables; a
# bounded leak of <= _IPP_CTX_MAX table sets beats a use-after-free.
_IPP_CTX: "dict[tuple, tuple]" = {}
_IPP_CTX_MAX = 8
_IPP_CTX_LOCK = threading.Lock()
_IPP_CTX_PARKED: list = []


def _ipp_gens_ctx(lib, G_eps, H_eps, n: int):
    key = (id(G_eps[0]), id(G_eps[-1]), id(H_eps[0]), id(H_eps[-1]), n)
    with _IPP_CTX_LOCK:
        hit = _IPP_CTX.get(key)
        if hit is not None:
            return hit[0]
    # packing the points (~0.6 s at n = 2^16) happens only on a miss: the
    # native ipp_create never reads G/H when handed a prebuilt ctx.
    # Build outside the lock (slow); a racing duplicate build is parked.
    ctx = lib.ed_ipp_ctx_new(_pack_points(G_eps), _pack_points(H_eps), n)
    with _IPP_CTX_LOCK:
        hit = _IPP_CTX.get(key)
        if hit is not None:
            _IPP_CTX_PARKED.append(ctx)
            return hit[0]
        if len(_IPP_CTX) >= _IPP_CTX_MAX:
            _, (old, _refs) = _IPP_CTX.popitem()
            _IPP_CTX_PARKED.append(old)
        _IPP_CTX[key] = (ctx, (G_eps[0], G_eps[-1], H_eps[0], H_eps[-1]))
    return ctx


def ipp_create_fused(strobe, ipp_label: bytes, Q_ep, G_factors, H_factors,
                     G_eps, H_eps, a, b, ct: bool = False):
    """Full IPP prover (all log2(n) rounds) in ONE native call
    (ipp_create.cpp, coefficient form: no point folds, prebuilt w-NAF
    generator tables cached across proofs) — returns (L_vec, R_vec,
    a_final, b_final) or None when the native path is unavailable.
    `strobe` must be the caller's NativeStrobe128; its state advances
    exactly like the Python rounds (proofs/ipp.py), which remain the
    parity ground truth."""
    lib = get_lib()
    if lib is None or not hasattr(strobe, "_buf"):
        return None
    from ..constants import L
    n = len(G_eps)
    if n <= 0 or n & (n - 1):
        return None
    lg = n.bit_length() - 1

    def _pack_scalars(xs):
        # ScalarVec holds exactly the packed canonical layout — zero-copy
        if isinstance(xs, ScalarVec):
            return xs.buf
        return b"".join((int(s) % L).to_bytes(32, "little") for s in xs)

    gf = _pack_scalars(G_factors)
    hf = _pack_scalars(H_factors)
    abuf = ctypes.create_string_buffer(_pack_scalars(a), 32 * n)
    bbuf = ctypes.create_string_buffer(_pack_scalars(b), 32 * n)
    ctx = _ipp_gens_ctx(lib, G_eps, H_eps, n)
    out_lr = ctypes.create_string_buffer(max(64 * lg, 1))
    # G/H buffers are never read when a prebuilt ctx is passed — skip the
    # 128n-byte packing entirely (it was ~0.6 s/prove at n = 2^16)
    rc = lib.ipp_create(strobe._buf, ipp_label, len(ipp_label),
                        _pack_points([Q_ep]), gf, hf, b"", b"",
                        abuf, bbuf, n, int(ct), out_lr, ctx)
    if rc != 0:
        return None
    L_vec = [out_lr.raw[64 * i: 64 * i + 32] for i in range(lg)]
    R_vec = [out_lr.raw[64 * i + 32: 64 * i + 64] for i in range(lg)]
    return (L_vec, R_vec,
            int.from_bytes(abuf.raw[:32], "little"),
            int.from_bytes(bbuf.raw[:32], "little"))


# fixed-base table slots (upstream EdwardsBasepointTable for B, B_blinding)
_FIXED_SLOTS: dict[bytes, int] = {}


def ed_fixed_slot(point) -> int | None:
    """Slot id for a fixed-base table of `point`, building it on first use;
    None when the library is unavailable or slots are exhausted."""
    lib = get_lib()
    if lib is None:
        return None
    blob = _pack_points([point])
    slot = _FIXED_SLOTS.get(blob)
    if slot is not None:
        return slot
    slot = len(_FIXED_SLOTS)
    if slot >= 8:
        return None
    lib.ed_fixed_init(slot, blob)
    _FIXED_SLOTS[blob] = slot
    return slot


def ed_fixed_mul(slot: int, scalar: int, ct: bool = True):
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    out = ctypes.create_string_buffer(128)
    lib.ed_fixed_mul(slot, (int(scalar) % L).to_bytes(32, "little"),
                     int(ct), out)
    return _unpack_point(out.raw)


def ed_fixed_commit_batch(slot_v: int, slot_b: int, vs, bs, ct: bool = True):
    """[v_i*T_v + b_i*T_b] — batched Pedersen commitments."""
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    n = len(vs)
    bv = b"".join((int(v) % L).to_bytes(32, "little") for v in vs)
    bb = b"".join((int(b) % L).to_bytes(32, "little") for b in bs)
    out = ctypes.create_string_buffer(128 * n)
    lib.ed_fixed_commit_batch(slot_v, slot_b, bv, bb, n, int(ct), out)
    return [_unpack_point(out.raw, i) for i in range(n)]


class ScalarVec:
    """Vector of scalars mod ℓ backed by the native 4x64 Montgomery module
    (scalarvec.cpp), with a pure-Python fallback so semantics never depend
    on the library being present.

    Upstream counterpart: curve25519-dalek Scalar52 batch loops as used by
    bulletproofs' verify_multiple scalar assembly.  Storage is packed
    32-byte little-endian canonical encodings; all inputs are reduced on
    construction.  Operations are elementwise and return new vectors.
    """

    __slots__ = ("buf", "n")

    def __init__(self, buf: bytes, n: int):
        self.buf = buf
        self.n = n

    # -- construction -------------------------------------------------------
    @staticmethod
    def from_ints(xs) -> "ScalarVec":
        from ..constants import L
        xs = [int(x) % L for x in xs]
        return ScalarVec(b"".join(x.to_bytes(32, "little") for x in xs),
                         len(xs))

    def to_ints(self) -> list[int]:
        return [int.from_bytes(self.buf[32 * i: 32 * i + 32], "little")
                for i in range(self.n)]

    def __len__(self) -> int:
        return self.n

    def reverse(self) -> "ScalarVec":
        chunks = [self.buf[32 * i: 32 * i + 32]
                  for i in range(self.n - 1, -1, -1)]
        return ScalarVec(b"".join(chunks), self.n)

    @staticmethod
    def concat(*vecs: "ScalarVec") -> "ScalarVec":
        return ScalarVec(b"".join(v.buf for v in vecs),
                         sum(v.n for v in vecs))

    # -- helpers ------------------------------------------------------------
    def _binop(self, other: "ScalarVec", cname: str, pyop):
        assert self.n == other.n
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return ScalarVec.from_ints(
                [pyop(a, b) % L for a, b in zip(self.to_ints(),
                                                other.to_ints())]
            )
        out = ctypes.create_string_buffer(32 * self.n)
        getattr(lib, cname)(self.buf, other.buf, self.n, out)
        return ScalarVec(out.raw, self.n)

    # -- ops ----------------------------------------------------------------
    def mul(self, other: "ScalarVec") -> "ScalarVec":
        return self._binop(other, "scl_mul", lambda a, b: a * b)

    def add(self, other: "ScalarVec") -> "ScalarVec":
        return self._binop(other, "scl_add", lambda a, b: a + b)

    def sub(self, other: "ScalarVec") -> "ScalarVec":
        return self._binop(other, "scl_sub", lambda a, b: a - b)

    def scale(self, k: int) -> "ScalarVec":
        from ..constants import L
        k = int(k) % L
        lib = get_lib()
        if lib is None:
            return ScalarVec.from_ints([a * k % L for a in self.to_ints()])
        out = ctypes.create_string_buffer(32 * self.n)
        lib.scl_mul_scalar(self.buf, k.to_bytes(32, "little"), self.n, out)
        return ScalarVec(out.raw, self.n)

    def axpb(self, x: int, b: int) -> "ScalarVec":
        """self[i]*x + b."""
        from ..constants import L
        x, b = int(x) % L, int(b) % L
        lib = get_lib()
        if lib is None:
            return ScalarVec.from_ints(
                [(a * x + b) % L for a in self.to_ints()]
            )
        out = ctypes.create_string_buffer(32 * self.n)
        lib.scl_axpb(self.buf, x.to_bytes(32, "little"),
                     b.to_bytes(32, "little"), self.n, out)
        return ScalarVec(out.raw, self.n)

    def muladd(self, other: "ScalarVec", addend: "ScalarVec") -> "ScalarVec":
        """self[i]*other[i] + addend[i]."""
        assert self.n == other.n == addend.n
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return ScalarVec.from_ints(
                [(a * b + c) % L for a, b, c in
                 zip(self.to_ints(), other.to_ints(), addend.to_ints())]
            )
        out = ctypes.create_string_buffer(32 * self.n)
        lib.scl_muladd(self.buf, other.buf, addend.buf, self.n, out)
        return ScalarVec(out.raw, self.n)

    def neg(self) -> "ScalarVec":
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return ScalarVec.from_ints([-a % L for a in self.to_ints()])
        out = ctypes.create_string_buffer(32 * self.n)
        lib.scl_neg(self.buf, self.n, out)
        return ScalarVec(out.raw, self.n)

    def sum(self) -> int:
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return sum(self.to_ints()) % L
        out = ctypes.create_string_buffer(32)
        lib.scl_sum(self.buf, self.n, out)
        return int.from_bytes(out.raw, "little")

    def inner(self, other: "ScalarVec") -> int:
        assert self.n == other.n
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return sum(a * b for a, b in zip(self.to_ints(),
                                             other.to_ints())) % L
        out = ctypes.create_string_buffer(32)
        lib.scl_inner(self.buf, other.buf, self.n, out)
        return int.from_bytes(out.raw, "little")

    def batch_invert(self) -> "ScalarVec":
        """Elementwise inverse (zero -> zero), Montgomery-trick batched."""
        lib = get_lib()
        if lib is None:
            from ..constants import L
            return ScalarVec.from_ints(
                [pow(a, L - 2, L) if a else 0 for a in self.to_ints()]
            )
        out = ctypes.create_string_buffer(32 * self.n)
        lib.scl_batch_invert(self.buf, self.n, out)
        return ScalarVec(out.raw, self.n)

    @staticmethod
    def powers(x: int, n: int) -> "ScalarVec":
        """[1, x, x^2, ..., x^(n-1)]."""
        from ..constants import L
        x = int(x) % L
        lib = get_lib()
        if lib is None:
            acc, out = 1, []
            for _ in range(n):
                out.append(acc)
                acc = acc * x % L
            return ScalarVec.from_ints(out)
        out = ctypes.create_string_buffer(32 * n)
        lib.scl_powers(x.to_bytes(32, "little"), n, out)
        return ScalarVec(out.raw, n)

    @staticmethod
    def from_wide_bytes(blob: bytes, n: int) -> "ScalarVec":
        """n 64-byte uniform blocks -> n canonical scalars (batched
        from_bytes_mod_order_wide)."""
        assert len(blob) == 64 * n
        lib = get_lib()
        if lib is None:
            from ..oracle.scalar import from_bytes_mod_order_wide
            return ScalarVec.from_ints([
                from_bytes_mod_order_wide(blob[64 * i: 64 * (i + 1)])
                for i in range(n)
            ])
        out = ctypes.create_string_buffer(32 * n)
        lib.scl_from_wide(blob, n, out)
        return ScalarVec(out.raw, n)

    @staticmethod
    def random(n: int) -> "ScalarVec":
        """n uniform scalars from one os.urandom draw (prover blindings;
        NOT for TranscriptRng-derived randomness, which must stay on the
        transcript's PRF stream)."""
        return ScalarVec.from_wide_bytes(os.urandom(64 * n), n)


def rangeproof_replay(strobe, rp_label: bytes, ipp_label: bytes, n: int,
                      m: int, v_blob: bytes, header_blob: bytes,
                      lr_blob: bytes, lg_n: int, want_raw: bool = False):
    """Fused verification-transcript replay (strobe.cpp): advances the
    native strobe through the whole rangeproof + IPP challenge sequence in
    one call and returns (y, z, x, w, c, [u_0..u_{lg_n-1}]) as ints — or,
    with want_raw, the (5+lg_n)*32-byte canonical little-endian blob in
    that same order (challenge scalars are emitted reduced mod ℓ, so the
    blob feeds fused_params_assembly without any int round-trip).
    Returns None when the native path is unavailable (pure-Python strobe);
    raises ProofError on an identity point exactly like
    transcript.validate_and_append_point."""
    lib = get_lib()
    buf = getattr(strobe, "_buf", None)
    if lib is None or buf is None:
        return None
    out = ctypes.create_string_buffer((5 + lg_n) * 32)
    rc = lib.rangeproof_replay(
        buf, rp_label, len(rp_label), ipp_label, len(ipp_label),
        n, m, v_blob, header_blob, lr_blob, lg_n, out,
    )
    if rc != 0:
        from ..proofs.errors import ProofError
        raise ProofError("point validation failed: identity")
    raw = out.raw
    if want_raw:
        return raw
    vals = [int.from_bytes(raw[32 * i: 32 * (i + 1)], "little")
            for i in range(5 + lg_n)]
    return vals[0], vals[1], vals[2], vals[3], vals[4], vals[5:]


def rangeproof_replay_batch(strobes, rp_label: bytes, ipp_label: bytes,
                            n: int, m: int, v_blob: bytes, wires: bytes,
                            wire_len: int, lg_n: int):
    """Whole-batch verification replay (strobe.cpp): nb transcripts advance
    through the challenge sequence in ONE native call, proofs parallel
    across the worker pool.  wires = concatenated proof wire bytes (the
    replay header/LR are slices of the wire).  Returns a list of
    (5+lg)*32-byte raw challenge blobs, or None when unavailable; raises
    ProofError naming the first proof with an identity point.  Each
    strobe's state advances exactly like the per-proof call."""
    lib = get_lib()
    if lib is None or not strobes or not hasattr(strobes[0], "_buf"):
        return None
    nb = len(strobes)
    sz = lib.strobe_sizeof()
    states = ctypes.create_string_buffer(nb * sz)
    for i, s in enumerate(strobes):
        ctypes.memmove(ctypes.byref(states, i * sz), s._buf, sz)
    blob = (5 + lg_n) * 32
    out = ctypes.create_string_buffer(nb * blob)
    rcs = (ctypes.c_int32 * nb)()
    lib.rangeproof_replay_batch(
        states, sz, rp_label, len(rp_label), ipp_label, len(ipp_label),
        n, m, v_blob, wires, wire_len, lg_n, nb, out, rcs,
    )
    for i in range(nb):
        if rcs[i] != 0:
            from ..proofs.errors import ProofError
            raise ProofError(
                f"point validation failed: identity (proof {i})")
    # copy the advanced states back for per-proof-call parity
    for i, s in enumerate(strobes):
        ctypes.memmove(s._buf, ctypes.byref(states, i * sz), sz)
    raw = out.raw
    return [raw[i * blob: (i + 1) * blob] for i in range(nb)]


_KIND_ID = {"ml": 0, "mr": 1, "mo": 2, "v": 3, "one": 4}


def flatten_constraints_vec(constraints, z: int, n: int, m: int,
                            pad: int = 0):
    """Native per-z constraint flatten (scalarvec.cpp scl_flatten; upstream
    r1cs/verifier.rs flattened_constraints): folds every constraint's terms
    with powers of z in one C pass and returns
    (wL, wR, wO as ScalarVecs of length n+pad, wV list[int] of length m,
    wc int), or None when the native library is unavailable.  Bit-exact
    twin of proofs.r1cs.constraint_system.flatten_constraints (the Python
    fold + from_ints conversion was ~0.7 ms/tx of the batched tx replay)."""
    lib = get_lib()
    if lib is None:
        return None
    from array import array

    from ..constants import L
    # flat (q, var, coeff) walk once, then columnar comprehensions — the
    # append-per-term form was ~1.2 us/term, ~0.8 ms of every batched-tx
    # replay (bench/onchip_campaign.log 2026-08-20 profile)
    kid = _KIND_ID
    terms = [(q, var, coeff)
             for q, lc in enumerate(constraints)
             for var, coeff in lc.terms]
    qs = array("i", [t[0] for t in terms])
    idxs = array("i", [t[1].index or 0 for t in terms])
    big = bytearray()
    if all(0 <= t[2] < 0x10000000000000000 for t in terms):
        # fast path: every coefficient is a small nonnegative (the gadget
        # library emits powers of two and +/-1; negatives go below)
        kinds = bytes([kid[t[1].kind] for t in terms])
        c64 = array("Q", [t[2] for t in terms])
    else:
        kinds_b = bytearray()
        c64 = array("Q")
        for _, var, coeff in terms:
            k = kid[var.kind]
            c = coeff
            if c < 0:
                k |= 0x80
                c = -c
            if c >> 64:
                k |= 0x40
                big += (c % L).to_bytes(32, "little")
                c64.append(0)
            else:
                c64.append(c)
            kinds_b.append(k)
        kinds = bytes(kinds_b)
    outL = ctypes.create_string_buffer(32 * (n + pad) or 1)
    outR = ctypes.create_string_buffer(32 * (n + pad) or 1)
    outO = ctypes.create_string_buffer(32 * (n + pad) or 1)
    outV = ctypes.create_string_buffer(32 * m or 1)
    outc = ctypes.create_string_buffer(32)
    lib.scl_flatten(
        qs.tobytes(), bytes(kinds), idxs.tobytes(), c64.tobytes(),
        bytes(big), len(qs), (int(z) % L).to_bytes(32, "little"), n, m,
        outL, outR, outO, outV, outc,
    )
    raw_v = outV.raw[: 32 * m]
    wV = [int.from_bytes(raw_v[32 * j: 32 * j + 32], "little")
          for j in range(m)]
    return (ScalarVec(outL.raw[: 32 * (n + pad)], n + pad),
            ScalarVec(outR.raw[: 32 * (n + pad)], n + pad),
            ScalarVec(outO.raw[: 32 * (n + pad)], n + pad),
            wV, int.from_bytes(outc.raw[:32], "little"))


def rangeproof_scalar_assembly(u_challenges, n: int, m: int, y: int,
                               z: int, a: int, b: int):
    """Fused per-proof verifier scalar assembly (scalarvec.cpp): returns
    (u_sq, u_inv_sq, g_v, h_v, delta) with g/h as packed ScalarVec, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..constants import L
    lg = len(u_challenges)
    nm = n * m
    out = ctypes.create_string_buffer((2 * lg + 2 * nm + 1) * 32)
    ub = b"".join((int(u) % L).to_bytes(32, "little") for u in u_challenges)
    rc = lib.rangeproof_scalar_assembly(
        ub, lg, n, m,
        (int(y) % L).to_bytes(32, "little"),
        (int(z) % L).to_bytes(32, "little"),
        (int(a) % L).to_bytes(32, "little"),
        (int(b) % L).to_bytes(32, "little"),
        out,
    )
    if rc != 0:
        return None
    raw = out.raw
    u_sq = [int.from_bytes(raw[32 * i: 32 * i + 32], "little")
            for i in range(lg)]
    u_inv_sq = [int.from_bytes(raw[32 * (lg + i): 32 * (lg + i) + 32],
                               "little") for i in range(lg)]
    g_v = ScalarVec(raw[32 * 2 * lg: 32 * (2 * lg + nm)], nm)
    h_v = ScalarVec(raw[32 * (2 * lg + nm): 32 * (2 * lg + 2 * nm)], nm)
    delta_val = int.from_bytes(raw[-32:], "little")
    return u_sq, u_inv_sq, g_v, h_v, delta_val


def fused_params_assembly(chal_blob: bytes, prf_blob: bytes,
                          wt_wide_blob: bytes, nb: int, lg: int,
                          n: int, m: int):
    """Whole-batch verification-params assembly (scalarvec.cpp): from the
    per-proof transcript challenges, proof scalars, and weight hashes,
    emit the packed (nb, 9+lg, 8)-u32 COMPACT channel params (wt, z,
    y_inv, allinv, a, b, x, cx, czz, u_sq[lg]; derived products synthesize
    on device) and (nb, 2, 8)-u32
    weighted [B_blinding, B] rows in one native call.  Returns
    (params, bbB) numpy arrays, or None when the native library is
    unavailable or an input challenge is zero (caller falls back to the
    Python path for the canonical error)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    c = 9 + lg  # compact channel layout (scalarvec.cpp)
    params = ctypes.create_string_buffer(nb * c * 32)
    bbB = ctypes.create_string_buffer(nb * 2 * 32)
    rc = lib.fused_params_assembly(
        chal_blob, prf_blob, wt_wide_blob, nb, lg, n, m, params, bbB)
    if rc != 0:
        return None
    return (
        np.frombuffer(params.raw, np.uint32).reshape(nb, c, 8).copy(),
        np.frombuffer(bbB.raw, np.uint32).reshape(nb, 2, 8).copy(),
    )
