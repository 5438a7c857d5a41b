// Fused inner-product-argument prover: all log2(n) rounds in ONE host call.
//
// Upstream counterpart: bulletproofs/src/inner_product_proof.rs
// InnerProductProof::create.  The transcript sequence (L/R commitments,
// challenge u, a/b scalar folds) mirrors proofs/ipp.py bit-for-bit — that
// Python path stays the ground truth and the parity oracle
// (tests/test_ipp.py).
//
// v2 — COEFFICIENT FORM (round 4): the G/H point-fold chains are gone.
// After r rounds the folded vector satisfies Ghat_r[i] = sum over original
// indices j with j mod m == i of (prod_s u_s^{±1}) * gf_j * G_j, so every
// round's L/R commitment is an MSM over the ORIGINAL generators with
// running coefficient vectors CG/CH updated by u / u^{-1} per half-run.
// That trades ~124 per-element 256-bit fold ladders (each 252 doubles) for
// n extra scalar muls per round (~100 ns each) and rides prebuilt width-6
// NAF tables in cached-Niels form that amortize across rounds AND proofs
// (edwards255.cpp ed_ipp_ctx_new / ed_ipp_round_msm).  L/R are the same
// group elements as the fold-based rounds, so compressed bytes — and hence
// the transcript and the proof — are bit-identical.
//
// Why fused at all: the per-round engine calls cost more in Python
// marshalling than the native group math itself — profiled at ~22 of the
// 25 ms of a 64-bit rangeproof prove in round 3.

#include <cstdint>
#include <cstring>
#include <vector>

// extern-C seams from the sibling translation units
extern "C" {
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
void* ed_ipp_ctx_new(const uint8_t* G, const uint8_t* H, int n);
void ed_ipp_ctx_free(void* ctx);
void* ed_ipp_materialize(void* ctx, const uint8_t* CG, const uint8_t* CH,
                         int mNew);
void* ed_ipp_qtab_new(const uint8_t* Q);
void ed_ipp_qtab_free(void* tab);
void ed_ipp_round_msm(void* ctx, void* qtab, const uint8_t* sG,
                      const uint8_t* sH, const uint8_t* cQ, uint8_t* out);
void ed_ipp_round_msm_pair(void* ctx, void* qtab,
                           const uint8_t* sGl, const uint8_t* sHl,
                           const uint8_t* cQl,
                           const uint8_t* sGr, const uint8_t* sHr,
                           const uint8_t* cQr, uint8_t* outLR);
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
// G/H: 128n-byte extended points (read-only in v2).
// a/b: 32n-byte canonical scalars (scratch, mutated; final values at [0]).
// out_LR: 64*lg2(n) bytes — compressed L,R per round.
// gens_ctx: optional prebuilt ed_ipp_ctx_new(G, H, n) handle (cached per
// generator set by the Python layer); null builds and frees one locally.
// Returns 0 on success, -1 on bad n.
int ipp_create(void* s, const uint8_t* ipp_label, size_t ipp_label_len,
               const uint8_t* Q, const uint8_t* Gf, const uint8_t* Hf,
               uint8_t* G, uint8_t* H, uint8_t* a, uint8_t* b,
               int n, int ct, uint8_t* out_LR, void* gens_ctx) {
    (void)ct;  // vartime throughout, as upstream's create
    if (n <= 0 || (n & (n - 1)) != 0) return -1;

    strobe_append_message(s, (const uint8_t*)"dom-sep", 7,
                          ipp_label, ipp_label_len);
    append_u64_msg(s, "n", 1, (uint64_t)n);

    void* ctx = gens_ctx ? gens_ctx : ed_ipp_ctx_new(G, H, n);
    void* qtab = ed_ipp_qtab_new(Q);

    // running per-original coefficient vectors (start = the lazy
    // first-round G_factors/H_factors, exactly like the fold-based rounds)
    std::vector<uint8_t> CG(Gf, Gf + 32 * (size_t)n);
    std::vector<uint8_t> CH(Hf, Hf + 32 * (size_t)n);
    std::vector<uint8_t> sGl((size_t)n * 32), sHl((size_t)n * 32);
    std::vector<uint8_t> sGr((size_t)n * 32), sHr((size_t)n * 32);
    std::vector<uint8_t> t1((size_t)n * 16), t2((size_t)n * 16);
    uint8_t LR_ext[256], cl[32], cr[32], u[32], u_inv[32];

    int m = n;
    int round = 0;
    int nb = n;              // current BASIS size per side (ctx->n)
    bool own_ctx = (gens_ctx == nullptr);
    while (m != 1) {
        int h = m / 2;
        uint8_t* aL = a;            uint8_t* aR = a + 32 * (size_t)h;
        uint8_t* bL = b;            uint8_t* bR = b + 32 * (size_t)h;

        // Basis index j sits at position i = j mod m of the folded
        // vector; positions split into contiguous lo/hi runs per block of
        // m.  L pairs aL with Ghat_hi and bR with Hhat_lo; R mirrors.
        std::memset(sGl.data(), 0, 32 * (size_t)nb);
        std::memset(sHl.data(), 0, 32 * (size_t)nb);
        std::memset(sGr.data(), 0, 32 * (size_t)nb);
        std::memset(sHr.data(), 0, 32 * (size_t)nb);
        for (int base = 0; base < nb; base += m) {
            scl_mul(aL, CG.data() + 32 * (size_t)(base + h), h,
                    sGl.data() + 32 * (size_t)(base + h));
            scl_mul(bR, CH.data() + 32 * (size_t)base, h,
                    sHl.data() + 32 * (size_t)base);
            scl_mul(aR, CG.data() + 32 * (size_t)base, h,
                    sGr.data() + 32 * (size_t)base);
            scl_mul(bL, CH.data() + 32 * (size_t)(base + h), h,
                    sHr.data() + 32 * (size_t)(base + h));
        }
        scl_inner(aL, bR, h, cl);
        scl_inner(aR, bL, h, cr);
        // L and R fill the whole pool in ONE dispatch (2 slices each)
        ed_ipp_round_msm_pair(ctx, qtab, sGl.data(), sHl.data(), cl,
                              sGr.data(), sHr.data(), cr, LR_ext);

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

        // ---- coefficient update (replaces the point fold):
        //   G' = u_inv*G_lo + u*G_hi  ->  CG lo *= u_inv, CG hi *= u
        //   H' = u*H_lo + u_inv*H_hi  ->  CH lo *= u,     CH hi *= u_inv
        // (skipped after the last round — nothing consumes them then)
        if (h > 1) {
            for (int base = 0; base < nb; base += m) {
                uint8_t* cg_lo = CG.data() + 32 * (size_t)base;
                uint8_t* cg_hi = cg_lo + 32 * (size_t)h;
                uint8_t* ch_lo = CH.data() + 32 * (size_t)base;
                uint8_t* ch_hi = ch_lo + 32 * (size_t)h;
                scl_mul_scalar(cg_lo, u_inv, h, cg_lo);
                scl_mul_scalar(cg_hi, u, h, cg_hi);
                scl_mul_scalar(ch_lo, u, h, ch_lo);
                scl_mul_scalar(ch_hi, u_inv, h, ch_hi);
            }
            // ---- large-n hybrid: once the fold has shrunk 8x below the
            // basis, collapse the coefficients into a materialized basis
            // of h points per side (one batched k-way fold ~3x cheaper
            // than the 2-way ladders it stands for) so subsequent round
            // MSMs touch h actives instead of nb — the pure coefficient
            // form is O(n) actives EVERY round, which is what made the
            // 2^15 R1CS prove IPP 5.3 s host-side.
            if (h >= 8 && nb / h >= 8) {
                void* nctx = ed_ipp_materialize(ctx, CG.data(), CH.data(),
                                                h);
                if (own_ctx) ed_ipp_ctx_free(ctx);
                ctx = nctx;
                own_ctx = true;
                nb = h;
                std::memset(CG.data(), 0, 32 * (size_t)nb);
                std::memset(CH.data(), 0, 32 * (size_t)nb);
                for (int i = 0; i < nb; i++) {
                    CG[32 * (size_t)i] = 1;   // canonical scalar one
                    CH[32 * (size_t)i] = 1;
                }
            }
        }

        m = h;
        round++;
    }
    ed_ipp_qtab_free(qtab);
    if (own_ctx) ed_ipp_ctx_free(ctx);
    return 0;
}

}  // extern "C"
