"""Curve, scalar, and protocol constants — the single home for every magic value.

Upstream counterparts: curve25519-dalek src/constants.rs + backend/serial/u64/constants.rs
(field/scalar constants, basepoint, d, sqrt(-1)), merlin/src/transcript.rs (protocol label),
bulletproofs/src/{generators.rs,transcript.rs} (generator seeding + domain separators),
slingshot/zkvm (transcript labels, opcode bytes).  Per SURVEY.md §7.3, every label and
constant that would need cross-validation against the Rust stack lives here.

All derived field constants are *computed* at import time from first principles
(p, d = -121665/121666, sqrt via pow) rather than transcribed as hex, so they cannot
be mis-transcribed; the Ristretto basepoint encoding is pinned as a known-answer check.
"""

# ---------------------------------------------------------------------------
# Field GF(p), p = 2^255 - 19
# ---------------------------------------------------------------------------
P = 2**255 - 19

# Edwards curve: -x^2 + y^2 = 1 + d x^2 y^2  (a = -1)
# d = -121665/121666 mod p
EDWARDS_D = (-121665 * pow(121666, P - 2, P)) % P
EDWARDS_D2 = (2 * EDWARDS_D) % P

# sqrt(-1) mod p: the principal value 2^((p-1)/4); canonicalized to the
# "nonnegative" (even) square root per RFC 9496 conventions.
_s = pow(2, (P - 1) // 4, P)
SQRT_M1 = _s if _s % 2 == 0 else P - _s  # == the even root of -1


def _sqrt_ratio(u: int, v: int) -> tuple[bool, int]:
    """Minimal sqrt_ratio for constant derivation (mirrors oracle.field.sqrt_ratio)."""
    if v == 0:
        return (u == 0), 0
    r = (u * pow(v, 3, P)) % P * pow((u * pow(v, 7, P)) % P, (P - 5) // 8, P) % P
    check = (v * r * r) % P
    if check == u % P:
        pass
    elif check == (-u) % P:
        r = (r * SQRT_M1) % P
    elif check == (-u * SQRT_M1) % P:
        r = (r * SQRT_M1) % P
        return False, min(r, P - r) if (r % 2 == 0) else 0  # not used for constants
    else:
        raise ValueError("not a square ratio while deriving constants")
    if r % 2 == 1:
        r = P - r
    return True, r


# Ristretto map constants (RFC 9496 §4.3.4 / curve25519-dalek constants.rs)
ONE_MINUS_D_SQ = (1 - EDWARDS_D * EDWARDS_D) % P
D_MINUS_ONE_SQ = ((EDWARDS_D - 1) * (EDWARDS_D - 1)) % P
# sqrt(a*d - 1) with a = -1  ->  sqrt(-d - 1)
_ok, SQRT_AD_MINUS_ONE = _sqrt_ratio((-EDWARDS_D - 1) % P, 1)
assert _ok
# 1/sqrt(a - d) = 1/sqrt(-1 - d)
_ok, _sqrt_amd = _sqrt_ratio(1, (-1 - EDWARDS_D) % P)
assert _ok
INVSQRT_A_MINUS_D = _sqrt_amd

# ---------------------------------------------------------------------------
# Scalar field, ℓ = 2^252 + 27742317777372353535851937790883648493
# (the order of the Ristretto255 group / ed25519 prime subgroup)
# ---------------------------------------------------------------------------
L = 2**252 + 27742317777372353535851937790883648493

# ---------------------------------------------------------------------------
# Ed25519 / Ristretto basepoint.  Compressed Edwards y (sign_x = 0, y = 4/5):
# the classic 0x58 66 66 ... encoding.  x recovered from the curve equation.
# ---------------------------------------------------------------------------
BASE_Y = (4 * pow(5, P - 2, P)) % P
# x^2 = (y^2 - 1) / (d y^2 + 1)
_u = (BASE_Y * BASE_Y - 1) % P
_v = (EDWARDS_D * BASE_Y * BASE_Y + 1) % P
_ok, BASE_X = _sqrt_ratio(_u, _v)
assert _ok
# compressed form has sign bit 0 => x even; _sqrt_ratio already returns the even root
BASE_T = (BASE_X * BASE_Y) % P

# Known-answer pin: the Ristretto255 encoding of the basepoint (RFC 9496 §A.1).
RISTRETTO_BASEPOINT_COMPRESSED = bytes.fromhex(
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
)
# The Edwards compressed basepoint (ed25519): y=4/5 LE with sign bit 0.
ED25519_BASEPOINT_COMPRESSED = bytes.fromhex(
    "5866666666666666666666666666666666666666666666666666666666666666"
)

# ---------------------------------------------------------------------------
# Device limb schedule (SURVEY.md §7.3): radix-2^13 × 20 limbs, int32 lanes.
# 20*13 = 260 bits; the wrap factor for reduction mod p is 19 * 2^(260-255).
# ---------------------------------------------------------------------------
LIMB_BITS = 13
NLIMBS = 20
LIMB_MASK = (1 << LIMB_BITS) - 1
WRAP = 19 * (1 << (NLIMBS * LIMB_BITS - 255))  # 19 * 2^5 = 608

# ---------------------------------------------------------------------------
# Transcript / protocol domain labels.
# merlin/src/transcript.rs: protocol label "Merlin v1.0", framing label "dom-sep".
# bulletproofs/src/transcript.rs: rangeproof/innerproduct/r1cs domain separators.
# ---------------------------------------------------------------------------
MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"
MERLIN_DOMSEP_LABEL = b"dom-sep"

LABEL_RANGEPROOF = b"rangeproof v1"
LABEL_IPP = b"ipp v1"
LABEL_R1CS = b"r1cs v1"
LABEL_R1CS_1PHASE = b"r1cs-1phase"
LABEL_R1CS_2PHASE = b"r1cs-2phase"

GENERATORS_CHAIN_LABEL = b"GeneratorsChain"

# ZkVM transcript labels (slingshot/zkvm/src/{vm.rs,tx.rs,predicate.rs,contract.rs}).
LABEL_ZKVM_R1CS = b"ZkVM.r1cs"
LABEL_ZKVM_TXID = b"ZkVM.txid"
LABEL_ZKVM_TAPROOT = b"ZkVM.taproot"
LABEL_ZKVM_CONTRACTID = b"ZkVM.contractid"
LABEL_ZKVM_MERKLE = b"ZkVM.merkle"

# starsig / musig (slingshot/{starsig,musig}).
LABEL_STARSIG = b"Starsig.v1"
LABEL_MUSIG = b"Musig.aggregated-key"
LABEL_KEYTREE = b"Keytree.derivation"
