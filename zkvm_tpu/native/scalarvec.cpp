// Vectorized arithmetic mod the group order l = 2^252 + 27742...493.
//
// Upstream counterpart: curve25519-dalek src/scalar.rs + backend/serial/
// u64/scalar.rs (Scalar52 Montgomery machinery), reshaped as batch
// operations over packed 32-byte little-endian arrays: the verifier's
// s-vector / g/h-scalar assembly and the prover's vector algebra do O(n)
// scalar muls per proof, and CPython big-int ops dominate that host
// profile.  4x64-limb CIOS Montgomery multiplication; ~15ns per mulmod.
//
// Constants (l, R^2 mod l, l-2) are injected from zkvm_tpu/constants.py at
// load time — no magic values transcribed here.  All inputs must be
// canonical (< l); the Python wrapper (native/__init__.py ScalarVec)
// guarantees this.

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

u64 L_[4];         // modulus limbs
u64 RR_[4];        // R^2 mod l  (R = 2^256)
u64 ONE_M[4];      // R mod l = to_mont(1)
uint8_t LM2[32];   // l - 2, little-endian (inversion exponent)
u64 N0INV;         // -l^{-1} mod 2^64

void load4(u64 r[4], const uint8_t* b) { memcpy(r, b, 32); }
void store4(uint8_t* b, const u64 r[4]) { memcpy(b, r, 32); }

bool geq4(const u64 a[4], const u64 b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

void sub4(u64 r[4], const u64 a[4], const u64 b[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        r[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

void mont_mul(u64 out[4], const u64 a[4], const u64 b[4]) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)a[j] * b[i] + c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s = (u128)t[4] + c;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);
        u64 m = t[0] * N0INV;
        c = ((u128)t[0] + (u128)m * L_[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 s2 = (u128)t[j] + (u128)m * L_[j] + c;
            t[j - 1] = (u64)s2;
            c = s2 >> 64;
        }
        s = (u128)t[4] + c;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
    }
    u64 r[4] = {t[0], t[1], t[2], t[3]};
    if (t[4] || geq4(r, L_)) sub4(r, r, L_);
    memcpy(out, r, 32);
}

void addmod(u64 r[4], const u64 a[4], const u64 b[4]) {
    u128 c = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a[i] + b[i] + c;
        t[i] = (u64)s;
        c = s >> 64;
    }
    if (c || geq4(t, L_)) sub4(t, t, L_);
    memcpy(r, t, 32);
}

void submod(u64 r[4], const u64 a[4], const u64 b[4]) {
    u64 t[4];
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 c = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)t[i] + L_[i] + c;
            t[i] = (u64)s;
            c = s >> 64;
        }
    }
    memcpy(r, t, 32);
}

void to_mont(u64 r[4], const u64 a[4]) { mont_mul(r, a, RR_); }

// a^(l-2) in the Montgomery domain: am must already be Montgomery form
void mont_pow_lm2(u64 out[4], const u64 am[4]) {
    u64 acc[4];
    memcpy(acc, ONE_M, 32);
    for (int bit = 255; bit >= 0; bit--) {
        mont_mul(acc, acc, acc);
        if ((LM2[bit >> 3] >> (bit & 7)) & 1) mont_mul(acc, acc, am);
    }
    memcpy(out, acc, 32);
}

bool is_zero4(const u64 a[4]) {
    return (a[0] | a[1] | a[2] | a[3]) == 0;
}

}  // namespace

extern "C" {

// 64 uniform little-endian bytes -> canonical scalar mod l (the
// challenge_scalar / TranscriptRng::random_scalar reduction).  Safe for
// lo,hi < 2^256: CIOS with one operand < l keeps t < 2l.
void sv_from_wide(const uint8_t* in64, uint8_t* out32) {
    u64 lo[4], hi[4], a[4], b[4];
    const u64 one[4] = {1, 0, 0, 0};
    load4(lo, in64);
    load4(hi, in64 + 32);
    mont_mul(a, lo, RR_);   // lo * R
    mont_mul(a, a, one);    // lo mod l
    mont_mul(b, hi, RR_);   // hi * 2^256 mod l
    addmod(a, a, b);
    store4(out32, a);
}


void scl_set_constants(const uint8_t* l_le, const uint8_t* rr_le,
                       const uint8_t* lm2_le) {
    load4(L_, l_le);
    load4(RR_, rr_le);
    memcpy(LM2, lm2_le, 32);
    // -l^{-1} mod 2^64 by Newton iteration
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - L_[0] * x;
    N0INV = (u64)0 - x;
    // R mod l = to_mont(1)
    u64 one[4] = {1, 0, 0, 0};
    mont_mul(ONE_M, one, RR_);
}

// elementwise out[i] = a[i] * b[i]
void scl_mul(const uint8_t* a, const uint8_t* b, int n, uint8_t* out) {
    for (int i = 0; i < n; i++) {
        u64 av[4], bv[4], bm[4], r[4];
        load4(av, a + 32 * i);
        load4(bv, b + 32 * i);
        to_mont(bm, bv);
        mont_mul(r, av, bm);
        store4(out + 32 * i, r);
    }
}

// out[i] = a[i] * b   (b a single scalar)
void scl_mul_scalar(const uint8_t* a, const uint8_t* b, int n, uint8_t* out) {
    u64 bv[4], bm[4];
    load4(bv, b);
    to_mont(bm, bv);
    for (int i = 0; i < n; i++) {
        u64 av[4], r[4];
        load4(av, a + 32 * i);
        mont_mul(r, av, bm);
        store4(out + 32 * i, r);
    }
}

void scl_add(const uint8_t* a, const uint8_t* b, int n, uint8_t* out) {
    for (int i = 0; i < n; i++) {
        u64 av[4], bv[4], r[4];
        load4(av, a + 32 * i);
        load4(bv, b + 32 * i);
        addmod(r, av, bv);
        store4(out + 32 * i, r);
    }
}

void scl_sub(const uint8_t* a, const uint8_t* b, int n, uint8_t* out) {
    for (int i = 0; i < n; i++) {
        u64 av[4], bv[4], r[4];
        load4(av, a + 32 * i);
        load4(bv, b + 32 * i);
        submod(r, av, bv);
        store4(out + 32 * i, r);
    }
}

void scl_neg(const uint8_t* a, int n, uint8_t* out) {
    u64 zero[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; i++) {
        u64 av[4], r[4];
        load4(av, a + 32 * i);
        submod(r, zero, av);
        store4(out + 32 * i, r);
    }
}

// out[i] = a[i]*x + b  (x, b single scalars)
void scl_axpb(const uint8_t* a, const uint8_t* x, const uint8_t* b, int n,
              uint8_t* out) {
    u64 xv[4], xm[4], bv[4];
    load4(xv, x);
    load4(bv, b);
    to_mont(xm, xv);
    for (int i = 0; i < n; i++) {
        u64 av[4], r[4];
        load4(av, a + 32 * i);
        mont_mul(r, av, xm);
        addmod(r, r, bv);
        store4(out + 32 * i, r);
    }
}

// out[i] = a[i]*b[i] + c[i]
void scl_muladd(const uint8_t* a, const uint8_t* b, const uint8_t* c, int n,
                uint8_t* out) {
    for (int i = 0; i < n; i++) {
        u64 av[4], bv[4], bm[4], cv[4], r[4];
        load4(av, a + 32 * i);
        load4(bv, b + 32 * i);
        load4(cv, c + 32 * i);
        to_mont(bm, bv);
        mont_mul(r, av, bm);
        addmod(r, r, cv);
        store4(out + 32 * i, r);
    }
}

// out = [1, x, x^2, ..., x^(n-1)]
void scl_powers(const uint8_t* x, int n, uint8_t* out) {
    if (n <= 0) return;
    u64 xv[4], xm[4], acc[4] = {1, 0, 0, 0};
    load4(xv, x);
    to_mont(xm, xv);
    store4(out, acc);
    for (int i = 1; i < n; i++) {
        mont_mul(acc, acc, xm);
        store4(out + 32 * i, acc);
    }
}

void scl_sum(const uint8_t* a, int n, uint8_t* out) {
    u64 acc[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; i++) {
        u64 av[4];
        load4(av, a + 32 * i);
        addmod(acc, acc, av);
    }
    store4(out, acc);
}

// <a, b> mod l
void scl_inner(const uint8_t* a, const uint8_t* b, int n, uint8_t* out) {
    // accumulate a[i]*b[i]*R^-1, fix the R^-1 once at the end
    u64 acc[4] = {0, 0, 0, 0};
    for (int i = 0; i < n; i++) {
        u64 av[4], bv[4], r[4];
        load4(av, a + 32 * i);
        load4(bv, b + 32 * i);
        mont_mul(r, av, bv);
        addmod(acc, acc, r);
    }
    mont_mul(acc, acc, RR_);
    store4(out, acc);
}

// Montgomery-trick batch inversion; zero entries invert to zero
void scl_batch_invert(const uint8_t* a, int n, uint8_t* out) {
    if (n <= 0) return;
    // prefix[i] = product of nonzero a[0..i-1] in Montgomery form
    u64* prefix = new u64[4 * (n + 1)];
    memcpy(prefix, ONE_M, 32);
    for (int i = 0; i < n; i++) {
        u64 av[4], am[4];
        load4(av, a + 32 * i);
        if (is_zero4(av)) {
            memcpy(prefix + 4 * (i + 1), prefix + 4 * i, 32);
        } else {
            to_mont(am, av);
            mont_mul(prefix + 4 * (i + 1), prefix + 4 * i, am);
        }
    }
    u64 inv[4];
    mont_pow_lm2(inv, prefix + 4 * n);  // (prod)^-1 in Montgomery form
    for (int i = n - 1; i >= 0; i--) {
        u64 av[4], am[4], r[4];
        load4(av, a + 32 * i);
        if (is_zero4(av)) {
            memset(out + 32 * i, 0, 32);
            continue;
        }
        mont_mul(r, inv, prefix + 4 * i);       // mont form of 1/a[i]
        u64 one[4] = {1, 0, 0, 0};
        u64 plain[4];
        mont_mul(plain, r, one);                // from_mont
        store4(out + 32 * i, plain);
        to_mont(am, av);
        mont_mul(inv, inv, am);
    }
    delete[] prefix;
}

}  // extern "C"
