// Host-side Edwards25519 group ops: Straus MSM, IPP fold, fixed-base tables.
//
// Upstream counterpart: curve25519-dalek src/edwards.rs +
// backend/serial/scalar_mul/straus.rs + src/window.rs
// (EdwardsBasepointTable).  The TPU Pallas pipeline (kernels/pallas_msm.py)
// owns LARGE MSMs; this module owns the small sequential host work — the
// IPP round spine (L/R commitments + G/H folds), Pedersen commits, and
// signature verification — where a device dispatch would cost more than the
// whole computation.  Formulas are add-2008-hwcd-3 / dbl-2008-hwcd (a=-1),
// bit-identical to zkvm_tpu/oracle/edwards.py which remains ground truth.
//
// Wire format: a point is 128 bytes — X,Y,Z,T as canonical 32-byte LE field
// encodings (same as ristretto255.cpp); scalars are 32-byte LE < l.
//
// Constant-time notes: table selects use branchless masked scans when
// ct != 0 (secret scalars: prover commitments, signing nonces).  Public
// verification data passes ct = 0 and takes the data-dependent fast path,
// matching upstream's vartime_multiscalar_mul.

#include "field51.h"

using namespace f51;

namespace {

struct ge {
    fe X, Y, Z, T;
};

fe D2_FE;  // 2d, injected
bool ED_SET = false;

void ge_id(ge& p) {
    memset(&p, 0, sizeof p);
    p.Y.v[0] = 1;
    p.Z.v[0] = 1;
}

void ge_frombytes(ge& p, const uint8_t* b) {
    fe_frombytes(p.X, b);
    fe_frombytes(p.Y, b + 32);
    fe_frombytes(p.Z, b + 64);
    fe_frombytes(p.T, b + 96);
}

void ge_tobytes(uint8_t* b, const ge& p) {
    fe_tobytes(b, p.X);
    fe_tobytes(b + 32, p.Y);
    fe_tobytes(b + 64, p.Z);
    fe_tobytes(b + 96, p.T);
}

// add-2008-hwcd-3 (unified, a = -1): mirrors oracle.edwards.add
void ge_add(ge& out, const ge& p, const ge& q) {
    fe A, B, C, D, E, F, G, H, t1, t2;
    fe_sub(t1, p.Y, p.X);
    fe_sub(t2, q.Y, q.X);
    fe_mul(A, t1, t2);
    fe_add(t1, p.Y, p.X);
    fe_add(t2, q.Y, q.X);
    fe_mul(B, t1, t2);
    fe_mul(t1, p.T, D2_FE);
    fe_mul(C, t1, q.T);
    fe_mul(t1, p.Z, q.Z);
    fe_add(D, t1, t1);
    fe_sub(E, B, A);
    fe_sub(F, D, C);
    fe_add(G, D, C);
    fe_add(H, B, A);
    fe_mul(out.X, E, F);
    fe_mul(out.Y, G, H);
    fe_mul(out.Z, F, G);
    fe_mul(out.T, E, H);
}

// dbl-2008-hwcd (a = -1): mirrors oracle.edwards.double
void ge_double(ge& out, const ge& p) {
    fe A, B, C, D, E, F, G, H, t;
    fe_sq(A, p.X);
    fe_sq(B, p.Y);
    fe_sq(t, p.Z);
    fe_add(C, t, t);
    fe_neg(D, A);
    fe_add(t, p.X, p.Y);
    fe_sq(t, t);
    fe_sub(t, t, A);
    fe_sub(E, t, B);
    fe_add(G, D, B);
    fe_sub(F, G, C);
    fe_sub(H, D, B);
    fe_mul(out.X, E, F);
    fe_mul(out.Y, G, H);
    fe_mul(out.Z, F, G);
    fe_mul(out.T, E, H);
}

void ge_neg(ge& out, const ge& p) {
    fe_neg(out.X, p.X);
    out.Y = p.Y;
    out.Z = p.Z;
    fe_neg(out.T, p.T);
}

// branchless conditional move: out = flag ? a : out (flag in {0,1})
void ge_cmov(ge& out, const ge& a, u64 flag) {
    u64 mask = (u64)0 - flag;
    for (int i = 0; i < 5; i++) {
        out.X.v[i] ^= mask & (out.X.v[i] ^ a.X.v[i]);
        out.Y.v[i] ^= mask & (out.Y.v[i] ^ a.Y.v[i]);
        out.Z.v[i] ^= mask & (out.Z.v[i] ^ a.Z.v[i]);
        out.T.v[i] ^= mask & (out.T.v[i] ^ a.T.v[i]);
    }
}

// signed radix-16 digits (curve25519-dalek Scalar::as_radix_16):
// 64 digits in [-8, 8]; valid for scalars < 2^255 (ours are < l < 2^253)
void to_radix_16(int8_t digits[64], const uint8_t* s) {
    for (int i = 0; i < 32; i++) {
        digits[2 * i] = (int8_t)(s[i] & 15);
        digits[2 * i + 1] = (int8_t)((s[i] >> 4) & 15);
    }
    int8_t carry = 0;
    for (int i = 0; i < 63; i++) {
        digits[i] += carry;
        carry = (int8_t)((digits[i] + 8) >> 4);
        digits[i] -= (int8_t)(carry << 4);
    }
    digits[63] += carry;
}

// table[j] = (j+1) * P for j in 0..7
void build_table8(ge table[8], const ge& p) {
    table[0] = p;
    for (int j = 1; j < 8; j++) ge_add(table[j], table[j - 1], p);
}

// acc += digit * table-of-P; ct selects branchless vs fast path
void add_digit(ge& acc, const ge table[8], int8_t digit, int ct) {
    if (ct) {
        u64 dabs = (u64)(digit < 0 ? -digit : digit);
        ge sel;
        ge_id(sel);
        for (int j = 0; j < 8; j++) {
            ge_cmov(sel, table[j], (u64)(dabs == (u64)(j + 1)));
        }
        ge negsel;
        ge_neg(negsel, sel);
        ge_cmov(sel, negsel, (u64)(digit < 0));
        ge sum;
        ge_add(sum, acc, sel);
        acc = sum;
    } else if (digit != 0) {
        ge sum;
        if (digit > 0) {
            ge_add(sum, acc, table[digit - 1]);
        } else {
            ge n;
            ge_neg(n, table[-digit - 1]);
            ge_add(sum, acc, n);
        }
        acc = sum;
    }
}

// fixed-base tables: slot -> 64 windows x 8 entries ((j+1) * 16^w * P)
const int MAX_SLOTS = 8;
ge FIXED[MAX_SLOTS][64][8];
bool FIXED_READY[MAX_SLOTS] = {false};

}  // namespace

extern "C" {

void ed_set_constants(const uint8_t* d2_le) {
    fe_frombytes(D2_FE, d2_le);
    ED_SET = true;
}

// out = sum scalars[i] * points[i]; Straus interleaved radix-16.
// scalars: 32n bytes LE; points: 128n bytes; out: 128 bytes.
void ed_msm(const uint8_t* scalars, const uint8_t* points, int n, int ct,
            uint8_t* out) {
    ge* tables = new ge[(size_t)n * 8];
    int8_t* digits = new int8_t[(size_t)n * 64];
    parallel_ranges(n, 16, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            ge p;
            ge_frombytes(p, points + 128 * i);
            build_table8(tables + 8 * i, p);
            to_radix_16(digits + 64 * i, scalars + 32 * i);
        }
    });
    // each worker runs Straus over its slice of points (own doubling
    // chain), partial results tree-add at the end
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = (int)(hw ? hw : 1);
    if (nthreads > 1 && n / nthreads < 32) nthreads = n / 32;
    if (nthreads < 1) nthreads = 1;
    std::vector<ge> partial(nthreads);
    parallel_ranges(nthreads, 1, [&](int tlo, int thi) {
        int chunk = (n + nthreads - 1) / nthreads;
        for (int t = tlo; t < thi; t++) {
            int lo = t * chunk;
            int hi = lo + chunk < n ? lo + chunk : n;
            ge acc;
            ge_id(acc);
            for (int w = 63; w >= 0; w--) {
                if (w != 63) {
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                }
                for (int i = lo; i < hi; i++) {
                    add_digit(acc, tables + 8 * i, digits[64 * i + w], ct);
                }
            }
            partial[t] = acc;
        }
    });
    ge acc = partial[0];
    for (int t = 1; t < nthreads; t++) {
        ge s;
        ge_add(s, acc, partial[t]);
        acc = s;
    }
    ge_tobytes(out, acc);
    delete[] tables;
    delete[] digits;
}

// out[i] = s1[i]*P[i] + s2[i]*Q[i]  (the IPP fold seam, n independent
// double-base muls sharing one digit loop per element)
void ed_fold(const uint8_t* s1, const uint8_t* s2, const uint8_t* P,
             const uint8_t* Q, int n, int ct, uint8_t* out) {
    parallel_ranges(n, 8, [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
        ge tp[8], tq[8], p, q;
        int8_t dp[64], dq[64];
        ge_frombytes(p, P + 128 * i);
        ge_frombytes(q, Q + 128 * i);
        build_table8(tp, p);
        build_table8(tq, q);
        to_radix_16(dp, s1 + 32 * i);
        to_radix_16(dq, s2 + 32 * i);
        ge acc;
        ge_id(acc);
        for (int w = 63; w >= 0; w--) {
            if (w != 63) {
                ge_double(acc, acc);
                ge_double(acc, acc);
                ge_double(acc, acc);
                ge_double(acc, acc);
            }
            add_digit(acc, tp, dp[w], ct);
            add_digit(acc, tq, dq[w], ct);
        }
        ge_tobytes(out + 128 * i, acc);
    }
    });
}

// out[i] = Q[i] + s * P[i] — ONE shared scalar across the batch, digits
// recoded once (the pending-factor IPP fold: one table + one add per
// window instead of two; ipp_create.cpp)
void ed_fold1(const uint8_t* s, const uint8_t* P, const uint8_t* Q,
              int n, int ct, uint8_t* out) {
    int8_t d[64];
    to_radix_16(d, s);
    parallel_ranges(n, 2, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            ge tp[8], p, q, acc, sum;
            ge_frombytes(p, P + 128 * i);
            ge_frombytes(q, Q + 128 * i);
            build_table8(tp, p);
            ge_id(acc);
            for (int w = 63; w >= 0; w--) {
                if (w != 63) {
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                    ge_double(acc, acc);
                }
                add_digit(acc, tp, d[w], ct);
            }
            ge_add(sum, acc, q);
            ge_tobytes(out + 128 * i, sum);
        }
    });
}

// elementwise batch add: out[i] = A[i] + B[i]
void ed_add_batch(const uint8_t* A, const uint8_t* B, int n, uint8_t* out) {
    parallel_ranges(n, 512, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            ge a, b, s;
            ge_frombytes(a, A + 128 * i);
            ge_frombytes(b, B + 128 * i);
            ge_add(s, a, b);
            ge_tobytes(out + 128 * i, s);
        }
    });
}

// precompute the radix-16 fixed-base table for a slot (window w holds
// (j+1) * 16^w * P) — upstream EdwardsBasepointTable::create
void ed_fixed_init(int slot, const uint8_t* point) {
    if (slot < 0 || slot >= MAX_SLOTS) return;
    ge p;
    ge_frombytes(p, point);
    for (int w = 0; w < 64; w++) {
        build_table8(FIXED[slot][w], p);
        // p <- 16 * p
        ge_double(p, p);
        ge_double(p, p);
        ge_double(p, p);
        ge_double(p, p);
    }
    FIXED_READY[slot] = true;
}

int ed_fixed_ready(int slot) {
    return (slot >= 0 && slot < MAX_SLOTS && FIXED_READY[slot]) ? 1 : 0;
}

// out = scalar * table[slot]: 64 table adds, zero doublings
void ed_fixed_mul(int slot, const uint8_t* scalar, int ct, uint8_t* out) {
    int8_t digits[64];
    to_radix_16(digits, scalar);
    ge acc;
    ge_id(acc);
    for (int w = 0; w < 64; w++) {
        add_digit(acc, FIXED[slot][w], digits[w], ct);
    }
    ge_tobytes(out, acc);
}

// out = a*table[slot_A] + b*table[slot_B] (batched commit seam:
// n Pedersen commitments v*B + gamma*B_blinding in one call)
void ed_fixed_commit_batch(int slot_v, int slot_b, const uint8_t* vs,
                           const uint8_t* bs, int n, int ct, uint8_t* out) {
    parallel_ranges(n, 32, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            int8_t dv[64], db[64];
            to_radix_16(dv, vs + 32 * i);
            to_radix_16(db, bs + 32 * i);
            ge acc;
            ge_id(acc);
            for (int w = 0; w < 64; w++) {
                add_digit(acc, FIXED[slot_v][w], dv[w], ct);
                add_digit(acc, FIXED[slot_b][w], db[w], ct);
            }
            ge_tobytes(out + 128 * i, acc);
        }
    });
}

// Horner fold of per-window MSM totals: out = sum_w 2^(w*wbits)*totals[w].
// Exact doubling chain (no mod-l reduction) so torsion-bearing Edwards
// representatives combine bit-identically to the oracle — the host half of
// the Pallas bucket pipeline (kernels/pallas_msm.py window_totals).
void ed_combine_windows(const uint8_t* totals, int nw, int wbits,
                        uint8_t* out) {
    ge acc;
    if (nw <= 0) {
        ge_id(acc);
        ge_tobytes(out, acc);
        return;
    }
    ge_frombytes(acc, totals + 128 * (size_t)(nw - 1));
    for (int w = nw - 2; w >= 0; w--) {
        for (int i = 0; i < wbits; i++) ge_double(acc, acc);
        ge q, s;
        ge_frombytes(q, totals + 128 * (size_t)w);
        ge_add(s, acc, q);
        acc = s;
    }
    ge_tobytes(out, acc);
}

int ed_constants_ready() { return ED_SET ? 1 : 0; }

}  // extern "C"
