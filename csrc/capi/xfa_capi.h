// Embeddable C API for the TPU flash-attention framework.
//
// TPU-native counterpart of the reference's extern "C" kernel surface
// (/root/reference/csrc/capi/flash_attn.h:11-319). All tensor arguments
// are HOST buffers in the reference's layouts: dense (b, s, h, d), packed
// varlen (total, h, d) + (b+1,) int32 cu_seqlens, softmax_lse (b, h, sq)
// fp32, attn bias fp32 (bias_b, bias_h, sq, sk) with bias_b in {1, b} and
// bias_h in {1, h}, flashmask startend_row_indices (b, fm_heads, sk,
// fm_nvec) int32 (fm_nvec in {1, 2, 4} — the reference's downstart /
// upend / downend / upstart vectors stacked on the last axis).
//
// dtype: 0 = float32, 1 = bfloat16 (raw 2-byte elements).
// softmax_scale <= 0 selects 1/sqrt(d). window_left/right < 0 = unbounded.
// Optional pointers (bias, flashmask, softmax_lse out, dbias out) may be
// NULL. Functions return 0 on success; on failure call xfa_get_error().
//
// Mapped N/A relative to the reference header: CUDA stream / rng_state /
// *_rounded / explicit stride arguments (XLA owns scheduling, layout and
// rng on TPU); is_bf16 is subsumed by `dtype`.
#pragma once

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define XFA_DTYPE_F32 0
#define XFA_DTYPE_BF16 1

const char* xfa_get_error(void);
int xfa_init(void);
void xfa_shutdown(void);

// Run setup code in the embedded namespace (model loading etc.).
int xfa_exec(const char* code);

// Legacy fp32 forward kept for ABI compatibility (kernel layout
// q (b, h, sq, d)); new code should use xfa_attn_fwd.
int xfa_flash_attn_fwd(const float* q, const float* k, const float* v,
                       float* out, int64_t b, int64_t h, int64_t hk,
                       int64_t sq, int64_t sk, int64_t d, int causal,
                       float softmax_scale);

// Dense forward (≙ flash_attn_fwd, reference capi/flash_attn.h:11).
// q (b, sq, h, d); k/v (b, sk, hk, d); out (b, sq, h, d) same dtype;
// softmax_lse (b, h, sq) fp32 or NULL.
int xfa_attn_fwd(const void* q, const void* k, const void* v,
                 const float* bias, const int32_t* flashmask,
                 void* out, float* softmax_lse,
                 int64_t b, int64_t sq, int64_t sk,
                 int64_t h, int64_t hk, int64_t d,
                 int64_t bias_b, int64_t bias_h,
                 int64_t fm_heads, int64_t fm_nvec,
                 int dtype, float p_dropout, uint64_t seed,
                 float softmax_scale, int causal,
                 int window_left, int window_right, float softcap);

// Dense backward (≙ flash_attn_bwd, reference capi/flash_attn.h:100).
// Consumes the forward's out and softmax_lse (no recompute of the
// forward pass). dbias fp32 (bias_b, bias_h, sq, sk) or NULL.
int xfa_attn_bwd(const void* dout, const void* q, const void* k,
                 const void* v, const void* out, const float* softmax_lse,
                 const float* bias, const int32_t* flashmask,
                 void* dq, void* dk, void* dv, float* dbias,
                 int64_t b, int64_t sq, int64_t sk,
                 int64_t h, int64_t hk, int64_t d,
                 int64_t bias_b, int64_t bias_h,
                 int64_t fm_heads, int64_t fm_nvec,
                 int dtype, float p_dropout, uint64_t seed,
                 float softmax_scale, int causal,
                 int window_left, int window_right, float softcap);

// Packed varlen forward (≙ flash_attn_varlen_fwd, capi/flash_attn.h:57).
// q (total_q, h, d); k/v (total_k, hk, d); cu_seqlens_* (batch+1,) int32;
// out (total_q, h, d); softmax_lse (h, total_q) fp32 or NULL.
int xfa_attn_varlen_fwd(const void* q, const void* k, const void* v,
                        const int32_t* cu_seqlens_q,
                        const int32_t* cu_seqlens_k,
                        void* out, float* softmax_lse,
                        int64_t total_q, int64_t total_k, int64_t batch,
                        int64_t h, int64_t hk, int64_t d,
                        int dtype, float p_dropout, uint64_t seed,
                        float softmax_scale, int causal,
                        int window_left, int window_right, float softcap);

// Packed varlen backward (≙ flash_attn_varlen_bwd, capi/flash_attn.h:163).
int xfa_attn_varlen_bwd(const void* dout, const void* q, const void* k,
                        const void* v,
                        const int32_t* cu_seqlens_q,
                        const int32_t* cu_seqlens_k,
                        void* dq, void* dk, void* dv,
                        int64_t total_q, int64_t total_k, int64_t batch,
                        int64_t h, int64_t hk, int64_t d,
                        int dtype, float p_dropout, uint64_t seed,
                        float softmax_scale, int causal,
                        int window_left, int window_right, float softcap);

// Reduced per-key attention scores (≙ calc_reduced_attn_scores,
// capi/flash_attn.h:223). q (b, sq, h, d); k (b, sk, hk, d);
// softmax_lse (b, h, sq) fp32 from a prior fwd or NULL (computed here);
// reduced (b, h, sk) fp32.
int xfa_calc_reduced_attn_scores(const void* q, const void* k,
                                 const float* softmax_lse, float* reduced,
                                 int64_t b, int64_t sq, int64_t sk,
                                 int64_t h, int64_t hk, int64_t d,
                                 int dtype, float softmax_scale,
                                 int causal);

// Greedy generation with a model loaded via xfa_exec.
int xfa_generate(const int32_t* prompt, int64_t prompt_len, int32_t* out,
                 int64_t max_new);

#ifdef __cplusplus
}  // extern "C"
#endif
