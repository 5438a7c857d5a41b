// Fused inner-product-argument prover: all log2(n) rounds in ONE host call.
//
// Upstream counterpart: bulletproofs/src/inner_product_proof.rs
// InnerProductProof::create.  The round structure (L/R commitment MSMs,
// transcript challenge u, a/b/G/H halving folds, lazy first-round
// G_factors/H_factors) mirrors proofs/ipp.py::InnerProductProof.create
// bit-for-bit — that Python path stays the ground truth and the parity
// oracle (tests/test_ipp.py).
//
// Why: the per-round engine calls cost more in Python marshalling
// (int.to_bytes / ctypes packing per scalar and point) than the native
// group math itself — profiled at ~22 of the 25 ms of a 64-bit rangeproof
// prove.  One crossing with contiguous byte buffers removes all of it.

#include <cstdint>
#include <cstring>
#include <vector>

// extern-C seams from the sibling translation units
extern "C" {
struct StrobeOpaque;  // real layout lives in strobe.cpp; only pointers here
void strobe_append_message(void* s, const uint8_t* label, size_t label_len,
                           const uint8_t* data, size_t data_len);
void strobe_challenge_bytes(void* s, const uint8_t* label, size_t label_len,
                            uint8_t* out, size_t n);
void sv_from_wide(const uint8_t* in64, uint8_t* out32);
void scl_mul(const uint8_t* a, const uint8_t* b, int n, uint8_t* out);
void scl_mul_scalar(const uint8_t* a, const uint8_t* b, int n, uint8_t* out);
void scl_add(const uint8_t* a, const uint8_t* b, int n, uint8_t* out);
void scl_inner(const uint8_t* a, const uint8_t* b, int n, uint8_t* out);
void scl_batch_invert(const uint8_t* a, int n, uint8_t* out);
void ed_msm(const uint8_t* scalars, const uint8_t* points, int n, int ct,
            uint8_t* out);
void ed_fold(const uint8_t* s1, const uint8_t* s2, const uint8_t* P,
             const uint8_t* Q, int n, int ct, uint8_t* out);
void ed_fold1(const uint8_t* s, const uint8_t* P, const uint8_t* Q,
              int n, int ct, uint8_t* out);
void ristretto_compress_batch(const uint8_t* in, int n, uint8_t* out);
}

namespace {

void append_u64_msg(void* s, const char* label, size_t ll, uint64_t v) {
    uint8_t le[8];
    for (int i = 0; i < 8; i++) le[i] = (uint8_t)(v >> (8 * i));
    strobe_append_message(s, (const uint8_t*)label, ll, le, 8);
}

void challenge_scalar(void* s, const char* label, size_t ll,
                      uint8_t out[32]) {
    uint8_t wide[64];
    strobe_challenge_bytes(s, (const uint8_t*)label, ll, wide, 64);
    sv_from_wide(wide, out);
}

}  // namespace

extern "C" {

// s: live transcript (advanced exactly like the Python path).
// ipp_label: the inner-product domain-separation label bytes.
// Q: 128-byte extended point.  Gf/Hf: 32n-byte factor vectors.
// G/H: 128n-byte extended points (scratch, mutated).
// a/b: 32n-byte canonical scalars (scratch, mutated; final values at [0]).
// out_LR: 64*lg2(n) bytes — compressed L,R per round.
// Returns 0 on success, -1 on bad n.
int ipp_create(void* s, const uint8_t* ipp_label, size_t ipp_label_len,
               const uint8_t* Q, const uint8_t* Gf, const uint8_t* Hf,
               uint8_t* G, uint8_t* H, uint8_t* a, uint8_t* b,
               int n, int ct, uint8_t* out_LR) {
    if (n <= 0 || (n & (n - 1)) != 0) return -1;

    strobe_append_message(s, (const uint8_t*)"dom-sep", 7,
                          ipp_label, ipp_label_len);
    append_u64_msg(s, "n", 1, (uint64_t)n);

    std::vector<uint8_t> sc((size_t)n * 32 + 32);      // MSM scalar buffer
    std::vector<uint8_t> pt((size_t)n * 128 + 128);    // MSM point buffer
    std::vector<uint8_t> t1((size_t)n * 16), t2((size_t)n * 16);
    std::vector<uint8_t> fold_out((size_t)n * 64);
    uint8_t LR_ext[256], c[32], u[32], u_inv[32], usq[32], uisq[32];

    // Pending-factor folds: the TRUE folded vectors are G = cg*Ghat,
    // H = ch*Hhat with cg = prod u_inv, ch = prod u over past rounds.
    // Folding Ghat[i] = Ghat_L[i] + u^2*Ghat_R[i] costs ONE table + one
    // add per window (ed_fold1) instead of two; the cg/ch factors ride
    // the (cheap) MSM scalar vectors.  L/R points are bit-identical:
    // the MSM computes the same group element, compression is canonical.
    uint8_t cg[32] = {1}, ch[32] = {1};
    bool cg_one = true;

    bool first = true;
    int round = 0;
    while (n != 1) {
        int h = n / 2;
        uint8_t* aL = a;            uint8_t* aR = a + 32 * (size_t)h;
        uint8_t* bL = b;            uint8_t* bR = b + 32 * (size_t)h;
        uint8_t* GL = G;            uint8_t* GR = G + 128 * (size_t)h;
        uint8_t* HL = H;            uint8_t* HR = H + 128 * (size_t)h;

        // ---- L = MSM(cg*(aL∘gfR) + ch*(bR∘hfL) + cL over GhatR + HhatL + Q)
        scl_inner(aL, bR, h, c);
        if (first) {
            scl_mul(aL, Gf + 32 * (size_t)h, h, sc.data());
            scl_mul(bR, Hf, h, sc.data() + 32 * (size_t)h);
        } else {
            std::memcpy(sc.data(), aL, 32 * (size_t)h);
            std::memcpy(sc.data() + 32 * (size_t)h, bR, 32 * (size_t)h);
        }
        if (!cg_one) {
            scl_mul_scalar(sc.data(), cg, h, sc.data());
            scl_mul_scalar(sc.data() + 32 * (size_t)h, ch, h,
                           sc.data() + 32 * (size_t)h);
        }
        std::memcpy(sc.data() + 64 * (size_t)h, c, 32);
        std::memcpy(pt.data(), GR, 128 * (size_t)h);
        std::memcpy(pt.data() + 128 * (size_t)h, HL, 128 * (size_t)h);
        std::memcpy(pt.data() + 256 * (size_t)h, Q, 128);
        ed_msm(sc.data(), pt.data(), 2 * h + 1, ct, LR_ext);

        // ---- R = MSM(cg*(aR∘gfL) + ch*(bL∘hfR) + cR over GhatL + HhatR + Q)
        scl_inner(aR, bL, h, c);
        if (first) {
            scl_mul(aR, Gf, h, sc.data());
            scl_mul(bL, Hf + 32 * (size_t)h, h, sc.data() + 32 * (size_t)h);
        } else {
            std::memcpy(sc.data(), aR, 32 * (size_t)h);
            std::memcpy(sc.data() + 32 * (size_t)h, bL, 32 * (size_t)h);
        }
        if (!cg_one) {
            scl_mul_scalar(sc.data(), cg, h, sc.data());
            scl_mul_scalar(sc.data() + 32 * (size_t)h, ch, h,
                           sc.data() + 32 * (size_t)h);
        }
        std::memcpy(sc.data() + 64 * (size_t)h, c, 32);
        std::memcpy(pt.data(), GL, 128 * (size_t)h);
        std::memcpy(pt.data() + 128 * (size_t)h, HR, 128 * (size_t)h);
        std::memcpy(pt.data() + 256 * (size_t)h, Q, 128);
        ed_msm(sc.data(), pt.data(), 2 * h + 1, ct, LR_ext + 128);

        ristretto_compress_batch(LR_ext, 2, out_LR + 64 * (size_t)round);
        strobe_append_message(s, (const uint8_t*)"L", 1,
                              out_LR + 64 * (size_t)round, 32);
        strobe_append_message(s, (const uint8_t*)"R", 1,
                              out_LR + 64 * (size_t)round + 32, 32);
        challenge_scalar(s, "u", 1, u);
        scl_batch_invert(u, 1, u_inv);

        // ---- fold scalars: a = aL*u + aR*u_inv; b = bL*u_inv + bR*u
        scl_mul_scalar(aL, u, h, t1.data());
        scl_mul_scalar(aR, u_inv, h, t2.data());
        scl_add(t1.data(), t2.data(), h, a);
        scl_mul_scalar(bL, u_inv, h, t1.data());
        scl_mul_scalar(bR, u, h, t2.data());
        scl_add(t1.data(), t2.data(), h, b);

        // ---- fold points (skipped after the last round — nothing
        // consumes the folded vectors then).  First round: exact
        // two-term fold with the per-element gf/hf factors (the lazy
        // first fold, as upstream); cg/ch stay 1.  Later rounds have the
        // SAME scalar pair (u_inv, u) for every element, so fold in
        // pending-factor form with ONE table + one add per window:
        //   Ghat = GhatL + u^2 * GhatR,     cg *= u_inv
        //   Hhat = HhatL + u_inv^2 * HhatR, ch *= u
        // (true G = cg*Ghat; the cg/ch factors ride the MSM scalars).
        if (h > 1) {
            if (first) {
                scl_mul_scalar(Gf, u_inv, h, t1.data());
                scl_mul_scalar(Gf + 32 * (size_t)h, u, h, t2.data());
                ed_fold(t1.data(), t2.data(), GL, GR, h, ct,
                        fold_out.data());
                std::memcpy(G, fold_out.data(), 128 * (size_t)h);
                scl_mul_scalar(Hf, u, h, t1.data());
                scl_mul_scalar(Hf + 32 * (size_t)h, u_inv, h, t2.data());
                ed_fold(t1.data(), t2.data(), HL, HR, h, ct,
                        fold_out.data());
                std::memcpy(H, fold_out.data(), 128 * (size_t)h);
            } else {
                scl_mul(u, u, 1, usq);
                scl_mul(u_inv, u_inv, 1, uisq);
                ed_fold1(usq, GR, GL, h, ct, fold_out.data());
                std::memcpy(G, fold_out.data(), 128 * (size_t)h);
                ed_fold1(uisq, HR, HL, h, ct, fold_out.data());
                std::memcpy(H, fold_out.data(), 128 * (size_t)h);
                scl_mul(cg, u_inv, 1, cg);
                scl_mul(ch, u, 1, ch);
                cg_one = false;
            }
        }

        first = false;
        n = h;
        round++;
    }
    return 0;
}

}  // extern "C"
