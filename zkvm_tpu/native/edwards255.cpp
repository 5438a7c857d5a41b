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

// out = sum scalars[i] * points[i]; Straus interleaved radix-16, with a
// vartime Pippenger bucket path above PIPPENGER_MIN (adds scale ~n*nw
// instead of ~n*64; windows parallelize across the pool).
// scalars: 32n bytes LE; points: 128n bytes; out: 128 bytes.

namespace {

constexpr int PIPPENGER_MIN = 4096;
constexpr int PIP_W = 13;                       // signed radix-2^13
constexpr int PIP_NW = (256 + PIP_W - 1) / PIP_W + 1;  // 20 + carry window
constexpr int PIP_NB = 1 << (PIP_W - 1);        // 4096 buckets

// signed radix-2^w digits, |d| <= 2^(w-1); valid for scalars < l < 2^253
void to_radix_2w(int16_t* digits, const uint8_t* s) {
    u64 x[5] = {0, 0, 0, 0, 0};
    memcpy(x, s, 32);
    int64_t carry = 0;
    for (int w = 0; w < PIP_NW; w++) {
        int bitpos = w * PIP_W;
        u64 raw = 0;
        int u64_idx = bitpos / 64, bit_idx = bitpos % 64;
        if (u64_idx < 5) {
            raw = x[u64_idx] >> bit_idx;
            if (bit_idx > 64 - PIP_W && u64_idx + 1 < 5)
                raw |= x[u64_idx + 1] << (64 - bit_idx);
        }
        int64_t d = (int64_t)(raw & ((1u << PIP_W) - 1)) + carry;
        carry = (d + PIP_NB) >> PIP_W;
        digits[w] = (int16_t)(d - (carry << PIP_W));
    }
}

void pippenger_msm(const uint8_t* scalars, const uint8_t* points, int n,
                   uint8_t* out) {
    // decode + recode once (parallel)
    std::vector<ge> pts((size_t)n);
    std::vector<int16_t> digits((size_t)n * PIP_NW);
    parallel_ranges(n, 64, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            ge_frombytes(pts[i], points + 128 * (size_t)i);
            to_radix_2w(digits.data() + (size_t)i * PIP_NW,
                        scalars + 32 * (size_t)i);
        }
    });
    // per-window bucket accumulation + fold; windows are independent
    std::vector<ge> wtot(PIP_NW);
    parallel_ranges(PIP_NW, 1, [&](int wlo, int whi) {
        std::vector<ge> buckets((size_t)PIP_NB);
        std::vector<uint8_t> hit((size_t)PIP_NB);
        for (int w = wlo; w < whi; w++) {
            memset(hit.data(), 0, (size_t)PIP_NB);
            for (int i = 0; i < n; i++) {
                int d = digits[(size_t)i * PIP_NW + w];
                if (d == 0) continue;
                int b = (d > 0 ? d : -d) - 1;
                ge* slot = &buckets[b];
                if (d > 0) {
                    if (hit[b]) {
                        ge s;
                        ge_add(s, *slot, pts[i]);
                        *slot = s;
                    } else {
                        *slot = pts[i];
                        hit[b] = 1;
                    }
                } else {
                    ge neg;
                    ge_neg(neg, pts[i]);
                    if (hit[b]) {
                        ge s;
                        ge_add(s, *slot, neg);
                        *slot = s;
                    } else {
                        *slot = neg;
                        hit[b] = 1;
                    }
                }
            }
            // fold: sum_b (b+1)*bucket[b] via running suffix sums
            ge run, acc;
            ge_id(run);
            ge_id(acc);
            for (int b = PIP_NB - 1; b >= 0; b--) {
                if (hit[b]) {
                    ge s;
                    ge_add(s, run, buckets[b]);
                    run = s;
                }
                ge s;
                ge_add(s, acc, run);
                acc = s;
            }
            wtot[w] = acc;
        }
    });
    // Horner combine across windows (serial, ~256 doubles)
    ge acc = wtot[PIP_NW - 1];
    for (int w = PIP_NW - 2; w >= 0; w--) {
        for (int k = 0; k < PIP_W; k++) ge_double(acc, acc);
        ge s;
        ge_add(s, acc, wtot[w]);
        acc = s;
    }
    ge_tobytes(out, acc);
}

}  // namespace

void ed_msm(const uint8_t* scalars, const uint8_t* points, int n, int ct,
            uint8_t* out) {
    if (!ct && n >= PIPPENGER_MIN) {
        pippenger_msm(scalars, points, n, out);
        return;
    }
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
    // grain: the per-thread duplicated doubling chain (252 doubles) pays
    // for itself down to ~8 points/thread now that the WorkerPool dispatch
    // is ~10us (IPP round MSMs are 65/33/17 points — was serial at grain
    // 32).  ZKVM_MSM_GRAIN overrides for per-host tuning.
    static const int grain = [] {
        const char* e = getenv("ZKVM_MSM_GRAIN");
        int g = e ? atoi(e) : 8;
        return g > 0 ? g : 8;
    }();
    if (nthreads > 1 && n / nthreads < grain) nthreads = n / grain;
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

// A-commitment fast path (range-proof BitCommitment, party.rs upstream):
//   out = blind * Bb + sum_i (bits[i] ? G[i] : -H[i])
// because a_L is a 0/1 bit vector and a_R = a_L - 1 lands in {0, -1}, the
// size-(2n+1) constant-time MSM collapses to ONE ct fixed ladder plus n
// ct two-way selects + n adds (~45us vs ~750us for the generic ct Straus).
// bits are SECRET: the select is a branchless cmov pair, every i does the
// same work.  blind: 32B scalar; Bb/G/H: 128B extended points.
void ed_bit_commit(const uint8_t* blind, const uint8_t* Bb,
                   const uint8_t* bits, const uint8_t* G, const uint8_t* H,
                   int n, uint8_t* out) {
    ge bb, acc;
    ge_frombytes(bb, Bb);
    ge tab[8];
    build_table8(tab, bb);
    int8_t d[64];
    to_radix_16(d, blind);
    ge_id(acc);
    for (int w = 63; w >= 0; w--) {
        if (w != 63) {
            ge_double(acc, acc);
            ge_double(acc, acc);
            ge_double(acc, acc);
            ge_double(acc, acc);
        }
        add_digit(acc, tab, d[w], 1);
    }
    for (int i = 0; i < n; i++) {
        ge g, h, sel, sum;
        ge_frombytes(g, G + 128 * (size_t)i);
        ge_frombytes(h, H + 128 * (size_t)i);
        ge_neg(sel, h);                       // default: -H_i (bit = 0)
        ge_cmov(sel, g, (u64)(bits[i] & 1));  // bit = 1 -> G_i
        ge_add(sum, acc, sel);
        acc = sum;
    }
    ge_tobytes(out, acc);
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

// ------------------------------------------------------------------------
// IPP round-MSM context: prebuilt width-6 w-NAF tables over the FIXED
// point set [Q, G_0..G_{n-1}, H_0..H_{n-1}] so every L/R commitment of the
// coefficient-form IPP prover (ipp_create.cpp) reuses them.  Tables hold
// odd multiples {1,3,..,31}·P in cached-Niels form (Y+X, Y−X, Z, T·2d):
// one fe_mul fewer per add than the generic unified formula, and the
// (Y±X)/T·2d precomputation is paid once per table entry, not per add.
// Upstream analogue: curve25519-dalek's NafLookupTable5 + vartime Straus
// (scalar_mul/straus.rs), widened to w=6 because the tables amortize over
// all log2(n) rounds here.

}  // extern "C"

namespace {

struct cge {
    fe YpX, YmX, Z, T2d;
};

void ge_to_cached(cge& c, const ge& p) {
    fe_add(c.YpX, p.Y, p.X);
    fe_sub(c.YmX, p.Y, p.X);
    c.Z = p.Z;
    fe_mul(c.T2d, p.T, D2_FE);
}

// add-2008-hwcd-3 with the q-side precomputed (8M): out = p + q
void ge_add_cached(ge& out, const ge& p, const cge& q) {
    fe A, B, C, D, E, F, G, H, t1;
    fe_sub(t1, p.Y, p.X);
    fe_mul(A, t1, q.YmX);
    fe_add(t1, p.Y, p.X);
    fe_mul(B, t1, q.YpX);
    fe_mul(C, p.T, q.T2d);
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

// out = p - q (cached): swap YpX/YmX and negate T2d contribution
void ge_sub_cached(ge& out, const ge& p, const cge& q) {
    fe A, B, C, D, E, F, G, H, t1;
    fe_sub(t1, p.Y, p.X);
    fe_mul(A, t1, q.YpX);
    fe_add(t1, p.Y, p.X);
    fe_mul(B, t1, q.YmX);
    fe_mul(C, p.T, q.T2d);
    fe_neg(C, C);
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

constexpr int WNAF_W = 6;               // digits odd, |d| <= 31
constexpr int WNAF_TAB = 1 << (WNAF_W - 2);  // 16 odd multiples

// signed width-w NAF (curve25519-dalek Scalar::non_adjacent_form):
// out[0..256], digits odd in (-2^{w-1}, 2^{w-1}), at most one nonzero in
// any w consecutive positions.  Valid for scalars < 2^255.
void to_wnaf(int8_t out[257], const uint8_t* s) {
    memset(out, 0, 257);
    u64 x[5] = {0, 0, 0, 0, 0};
    memcpy(x, s, 32);
    const u64 width = 1ull << WNAF_W;
    const u64 window_mask = width - 1;
    int pos = 0;
    u64 carry = 0;
    while (pos < 256) {
        int u64_idx = pos / 64;
        int bit_idx = pos % 64;
        u64 bit_buf;
        if (bit_idx < 64 - WNAF_W) {
            bit_buf = x[u64_idx] >> bit_idx;
        } else {
            bit_buf = (x[u64_idx] >> bit_idx) | (x[u64_idx + 1]
                                                 << (64 - bit_idx));
        }
        u64 window = carry + (bit_buf & window_mask);
        if ((window & 1) == 0) {
            pos += 1;
            continue;
        }
        if (window < width / 2) {
            carry = 0;
            out[pos] = (int8_t)window;
        } else {
            carry = 1;
            out[pos] = (int8_t)((int64_t)window - (int64_t)width);
        }
        pos += WNAF_W;
    }
}

// table[j] = (2j+1) * P in cached form
void build_wnaf_table(cge* table, const ge& p) {
    ge p2, cur;
    ge_double(p2, p);
    cge c2;
    ge_to_cached(c2, p2);
    cur = p;
    ge_to_cached(table[0], cur);
    for (int j = 1; j < WNAF_TAB; j++) {
        ge next;
        ge_add_cached(next, cur, c2);
        cur = next;
        ge_to_cached(table[j], cur);
    }
}

struct IppCtx {
    int n;                   // generator count per side
    std::vector<cge> tabs;   // 2n * WNAF_TAB: [G_0.., H_0..]
};

}  // namespace

extern "C" {

// Build the per-gens round-MSM context (G/H only: these amortize across
// proofs; Q = w*B is fresh per proof — ed_ipp_qtab_new).
void* ed_ipp_ctx_new(const uint8_t* G, const uint8_t* H, int n) {
    IppCtx* ctx = new IppCtx;
    ctx->n = n;
    ctx->tabs.resize((size_t)(2 * n) * WNAF_TAB);
    parallel_ranges(2 * n, 8, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++) {
            ge p;
            const uint8_t* src = i < n ? G + 128 * (size_t)i
                                       : H + 128 * (size_t)(i - n);
            ge_frombytes(p, src);
            build_wnaf_table(ctx->tabs.data() + (size_t)i * WNAF_TAB, p);
        }
    });
    return ctx;
}

void ed_ipp_ctx_free(void* ctx) { delete (IppCtx*)ctx; }

void* ed_ipp_qtab_new(const uint8_t* Q) {
    cge* tab = new cge[WNAF_TAB];
    ge q;
    ge_frombytes(q, Q);
    build_wnaf_table(tab, q);
    return tab;
}

void ed_ipp_qtab_free(void* tab) { delete[] (cge*)tab; }

}  // extern "C"

namespace {

// gather active (table, wnaf-digit) pairs for one commitment MSM
struct MsmJob {
    std::vector<int8_t> nafs;        // na * 257
    std::vector<const cge*> tptr;    // na
    int na = 0;

    void build(const IppCtx* ctx, const cge* qtab, const uint8_t* sG,
               const uint8_t* sH, const uint8_t* cQ) {
        const int n = ctx->n;
        auto is_zero32 = [](const uint8_t* p) {
            u64 w[4];
            memcpy(w, p, 32);
            return (w[0] | w[1] | w[2] | w[3]) == 0;
        };
        std::vector<int> act;
        act.reserve(2 * n + 1);
        act.push_back(-1);  // Q
        for (int j = 0; j < n; j++)
            if (!is_zero32(sG + 32 * (size_t)j)) act.push_back(j);
        for (int j = 0; j < n; j++)
            if (!is_zero32(sH + 32 * (size_t)j)) act.push_back(n + j);
        na = (int)act.size();
        nafs.resize((size_t)na * 257);
        tptr.resize(na);
        for (int k = 0; k < na; k++) {
            int j = act[k];
            const uint8_t* s = j < 0 ? cQ
                             : j < n ? sG + 32 * (size_t)j
                                     : sH + 32 * (size_t)(j - n);
            to_wnaf(nafs.data() + (size_t)k * 257, s);
            tptr[k] = j < 0 ? qtab
                            : ctx->tabs.data() + (size_t)j * WNAF_TAB;
        }
    }

    // sum over the [lo, hi) slice of active points
    void run_slice(ge& out, int lo, int hi) const {
        ge acc;
        ge_id(acc);
        bool started = false;
        for (int pos = 256; pos >= 0; pos--) {
            if (started) ge_double(acc, acc);
            for (int k = lo; k < hi; k++) {
                int8_t d = nafs[(size_t)k * 257 + pos];
                if (d > 0) {
                    ge s;
                    ge_add_cached(s, acc, tptr[k][(d - 1) >> 1]);
                    acc = s;
                    started = true;
                } else if (d < 0) {
                    ge s;
                    ge_sub_cached(s, acc, tptr[k][(-d - 1) >> 1]);
                    acc = s;
                    started = true;
                }
            }
        }
        out = acc;
    }
};

// run one or two commitment MSMs over ONE pool dispatch: slices split the
// thread budget between the jobs so an L/R pair fills the machine instead
// of serializing two half-filled MSMs
void run_jobs(const MsmJob* jobs, int njobs, uint8_t* outs) {
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = (int)(hw ? hw : 1);
    int per = nthreads / njobs > 0 ? nthreads / njobs : 1;
    struct Slice { int job, lo, hi; };
    std::vector<Slice> slices;
    for (int j = 0; j < njobs; j++) {
        int na = jobs[j].na;
        int k = per;
        if (k > 1 && na / k < 8) k = na / 8;
        if (k < 1) k = 1;
        int chunk = (na + k - 1) / k;
        for (int t = 0; t < k; t++) {
            int lo = t * chunk, hi = lo + chunk < na ? lo + chunk : na;
            if (lo < hi) slices.push_back({j, lo, hi});
        }
    }
    std::vector<ge> partial(slices.size());
    parallel_ranges((int)slices.size(), 1, [&](int lo, int hi) {
        for (int i = lo; i < hi; i++)
            jobs[slices[i].job].run_slice(partial[i], slices[i].lo,
                                          slices[i].hi);
    });
    for (int j = 0; j < njobs; j++) {
        ge acc;
        bool first = true;
        for (size_t i = 0; i < slices.size(); i++) {
            if (slices[i].job != j) continue;
            if (first) {
                acc = partial[i];
                first = false;
            } else {
                ge s;
                ge_add(s, acc, partial[i]);
                acc = s;
            }
        }
        ge_tobytes(outs + 128 * (size_t)j, acc);
    }
}

}  // namespace

extern "C" {

// One L/R commitment: out = cQ*Q + sum_j sG[j]*G_j + sum_j sH[j]*H_j.
// sG/sH: 32n bytes each; STRUCTURALLY zero entries (the inactive half of
// the coefficient-form round) are skipped — vartime, exactly like
// upstream's vartime_multiscalar_mul in inner_product_proof.rs create.
void ed_ipp_round_msm(void* vctx, void* vqtab, const uint8_t* sG,
                      const uint8_t* sH, const uint8_t* cQ, uint8_t* out) {
    MsmJob job;
    job.build((const IppCtx*)vctx, (const cge*)vqtab, sG, sH, cQ);
    run_jobs(&job, 1, out);
}

// L and R of one round in a single pool dispatch (they are independent:
// both read only a/b and the coefficient vectors of the round)
void ed_ipp_round_msm_pair(void* vctx, void* vqtab,
                           const uint8_t* sGl, const uint8_t* sHl,
                           const uint8_t* cQl,
                           const uint8_t* sGr, const uint8_t* sHr,
                           const uint8_t* cQr, uint8_t* outLR) {
    MsmJob jobs[2];
    jobs[0].build((const IppCtx*)vctx, (const cge*)vqtab, sGl, sHl, cQl);
    jobs[1].build((const IppCtx*)vctx, (const cge*)vqtab, sGr, sHr, cQr);
    run_jobs(jobs, 2, outLR);
}

// 8-way basis materialization (large-n IPP): collapse the pending
// coefficient vectors into a NEW basis of mNew points per side,
//   NewG[i] = sum_{j mod mNew == i} CG[j] * G_j   (H likewise),
// and build fresh w-NAF tables over it.  One k-way batched fold costs
// ~553 ops/output vs ~3*324 for the three 2-way fold ladders it replaces,
// and keeps the per-round MSM active set at the BASIS size instead of the
// original n — the coefficient form alone is O(n * lg n) group ops at
// R1CS scale (5.3 s at n = 2^16).  Returns a new ctx (caller frees).
void* ed_ipp_materialize(void* vctx, const uint8_t* CG, const uint8_t* CH,
                         int mNew) {
    const IppCtx* ctx = (const IppCtx*)vctx;
    const int nb = ctx->n;
    const int k = nb / mNew;
    IppCtx* out = new IppCtx;
    out->n = mNew;
    out->tabs.resize((size_t)(2 * mNew) * WNAF_TAB);
    parallel_ranges(2 * mNew, 4, [&](int lo, int hi) {
        std::vector<int8_t> nafs((size_t)k * 257);
        for (int o = lo; o < hi; o++) {
            int side = o < mNew ? 0 : 1;           // 0 = G, 1 = H
            int i = side ? o - mNew : o;
            const uint8_t* C = side ? CH : CG;
            const cge* base_tabs = ctx->tabs.data()
                                   + (size_t)side * nb * WNAF_TAB;
            for (int t = 0; t < k; t++)
                to_wnaf(nafs.data() + (size_t)t * 257,
                        C + 32 * (size_t)(i + t * mNew));
            ge acc;
            ge_id(acc);
            bool started = false;
            for (int pos = 256; pos >= 0; pos--) {
                if (started) ge_double(acc, acc);
                for (int t = 0; t < k; t++) {
                    int8_t d = nafs[(size_t)t * 257 + pos];
                    if (d == 0) continue;
                    const cge* tab = base_tabs
                        + (size_t)(i + t * mNew) * WNAF_TAB;
                    ge s;
                    if (d > 0) ge_add_cached(s, acc, tab[(d - 1) >> 1]);
                    else       ge_sub_cached(s, acc, tab[(-d - 1) >> 1]);
                    acc = s;
                    started = true;
                }
            }
            build_wnaf_table(out->tabs.data() + (size_t)o * WNAF_TAB, acc);
        }
    });
    return out;
}

}  // extern "C"
