/* Smoke test for the embeddable C API: boot the runtime from plain C,
 * run the typed attention surface (dense fwd+bwd with bias/dbias and
 * flashmask, packed varlen fwd+bwd, reduced scores) and greedy-generate
 * from a tiny model — the same "external framework dlopens one library"
 * usage the reference's csrc/capi serves. */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

#include "xfa_capi.h"

static float frand(void) { return rand() / (float)RAND_MAX - 0.5f; }

static double mean_abs(const float* x, int64_t n) {
  double m = 0;
  for (int64_t i = 0; i < n; ++i) m += fabs(x[i]);
  return m / n;
}

static int check_mean(const char* what, const float* x, int64_t n,
                      double lo, double hi) {
  double m = mean_abs(x, n);
  printf("%s ok, mean |x| = %.4f\n", what, m);
  if (!(m > lo && m < hi)) {
    fprintf(stderr, "%s out of range\n", what);
    return 0;
  }
  return 1;
}

int main(void) {
  if (xfa_init() != 0) {
    fprintf(stderr, "init failed: %s\n", xfa_get_error());
    return 1;
  }
  /* attention forward */
  const int64_t b = 1, h = 2, s = 128, d = 64;
  int64_t n = b * h * s * d;
  float *q = malloc(n * 4), *k = malloc(n * 4), *v = malloc(n * 4),
        *o = malloc(n * 4);
  srand(0);
  for (int64_t i = 0; i < n; ++i) {
    q[i] = (rand() / (float)RAND_MAX - 0.5f);
    k[i] = (rand() / (float)RAND_MAX - 0.5f);
    v[i] = (rand() / (float)RAND_MAX - 0.5f);
  }
  if (xfa_flash_attn_fwd(q, k, v, o, b, h, h, s, s, d, 1, -1.0f) != 0) {
    fprintf(stderr, "fwd failed: %s\n", xfa_get_error());
    return 1;
  }
  double mean = 0;
  for (int64_t i = 0; i < n; ++i) mean += fabs(o[i]);
  printf("attention ok, mean |o| = %.4f\n", mean / n);
  if (!(mean / n > 0.0001 && mean / n < 1.0)) return 1;

  /* typed dense surface; the (b, s, h, d) buffers from above
   * reinterpret fine (layout-only smoke checks). */
  {
    float* o_plain = malloc(n * 4);
    float* lse = malloc(b * h * s * 4);
    if (xfa_attn_fwd(q, k, v, NULL, NULL, o_plain, lse, b, s, s, h, h, d,
                     0, 0, 0, 0, XFA_DTYPE_F32, 0.0f, 0, -1.0f, 1, -1, -1,
                     0.0f) != 0) {
      fprintf(stderr, "attn_fwd failed: %s\n", xfa_get_error());
      return 1;
    }
    if (!check_mean("typed fwd", o_plain, n, 0.0001, 1.0)) return 1;
    if (!check_mean("lse", lse, b * h * s, 0.0001, 100.0)) return 1;

    /* flashmask (causal LT, nv = 1): an all-visible mask must reproduce
     * the plain causal forward. */
    int32_t* fm = malloc(b * s * 4);
    float* o_fm = malloc(n * 4);
    for (int64_t i = 0; i < b * s; ++i) fm[i] = (int32_t)s;
    if (xfa_attn_fwd(q, k, v, NULL, fm, o_fm, NULL, b, s, s, h, h, d,
                     0, 0, 1, 1, XFA_DTYPE_F32, 0.0f, 0, -1.0f, 1, -1, -1,
                     0.0f) != 0) {
      fprintf(stderr, "flashmask fwd failed: %s\n", xfa_get_error());
      return 1;
    }
    double dmax = 0;
    for (int64_t i = 0; i < n; ++i) {
      double dd = fabs(o_fm[i] - o_plain[i]);
      if (dd > dmax) dmax = dd;
    }
    printf("flashmask fwd ok, max |o_fm - o_causal| = %.5f\n", dmax);
    if (dmax > 5e-2) return 1;

    /* fwd + bwd with a trained batch-broadcast bias -> dbias */
    float* bias = malloc(h * s * s * 4);
    float* dbias = malloc(h * s * s * 4);
    float *dq = malloc(n * 4), *dk = malloc(n * 4), *dv = malloc(n * 4);
    float* o_b = malloc(n * 4);
    for (int64_t i = 0; i < h * s * s; ++i) bias[i] = 0.01f * frand();
    if (xfa_attn_fwd(q, k, v, bias, NULL, o_b, lse, b, s, s, h, h, d,
                     1, h, 0, 0, XFA_DTYPE_F32, 0.0f, 0, -1.0f, 1, -1, -1,
                     0.0f) != 0) {
      fprintf(stderr, "attn_fwd (bias) failed: %s\n", xfa_get_error());
      return 1;
    }
    if (xfa_attn_bwd(o_b /* dout: reuse */, q, k, v, o_b, lse, bias, NULL,
                     dq, dk, dv, dbias, b, s, s, h, h, d, 1, h, 0, 0,
                     XFA_DTYPE_F32, 0.0f, 0, -1.0f, 1, -1, -1, 0.0f) != 0) {
      fprintf(stderr, "attn_bwd failed: %s\n", xfa_get_error());
      return 1;
    }
    if (!check_mean("typed bwd dq", dq, n, 1e-6, 10.0)) return 1;
    if (!check_mean("typed bwd dbias", dbias, h * s * s, 1e-9, 10.0))
      return 1;
    free(o_plain); free(lse); free(bias); free(dbias);
    free(dq); free(dk); free(dv); free(fm); free(o_fm); free(o_b);
  }

  /* packed varlen fwd + bwd (2 sequences) */
  {
    const int64_t tq = 192, batch2 = 2;
    int32_t cu[3] = {0, 64, 192};
    int64_t np = tq * h * d;
    float *qp = malloc(np * 4), *kp = malloc(np * 4), *vp = malloc(np * 4);
    float *op = malloc(np * 4), *lsep = malloc(h * tq * 4);
    float *dqp = malloc(np * 4), *dkp = malloc(np * 4), *dvp = malloc(np * 4);
    for (int64_t i = 0; i < np; ++i) {
      qp[i] = frand(); kp[i] = frand(); vp[i] = frand();
    }
    if (xfa_attn_varlen_fwd(qp, kp, vp, cu, cu, op, lsep, tq, tq, batch2,
                            h, h, d, XFA_DTYPE_F32, 0.0f, 0, -1.0f, 1, -1,
                            -1, 0.0f) != 0) {
      fprintf(stderr, "varlen fwd failed: %s\n", xfa_get_error());
      return 1;
    }
    if (!check_mean("varlen fwd", op, np, 0.0001, 1.0)) return 1;
    if (xfa_attn_varlen_bwd(op, qp, kp, vp, cu, cu, dqp, dkp, dvp, tq, tq,
                            batch2, h, h, d, XFA_DTYPE_F32, 0.0f, 0, -1.0f,
                            1, -1, -1, 0.0f) != 0) {
      fprintf(stderr, "varlen bwd failed: %s\n", xfa_get_error());
      return 1;
    }
    if (!check_mean("varlen bwd dq", dqp, np, 1e-6, 10.0)) return 1;
    free(qp); free(kp); free(vp); free(op); free(lsep);
    free(dqp); free(dkp); free(dvp);
  }

  /* reduced attention scores (lse computed internally) */
  {
    float* red = malloc(b * h * s * 4);
    if (xfa_calc_reduced_attn_scores(q, k, NULL, red, b, s, s, h, h, d,
                                     XFA_DTYPE_F32, -1.0f, 1) != 0) {
      fprintf(stderr, "reduced scores failed: %s\n", xfa_get_error());
      return 1;
    }
    /* probabilities sum to sq over all keys+queries: mean == sq / sk == 1 */
    if (!check_mean("reduced scores", red, b * h * s, 0.5, 2.0)) return 1;
    free(red);
  }

  /* model setup + generation through the same ABI */
  const char* setup =
      "import jax as _jax, jax.numpy as _jnp\n"
      "from xhy_flash_attention_tpu.models.gpt import GPTConfig, GPTLMHeadModel\n"
      "_cfg = GPTConfig(vocab_size=64, hidden_size=64, num_hidden_layers=2,\n"
      "                 num_attention_heads=4, intermediate_size=128,\n"
      "                 max_position_embeddings=128, dtype=_jnp.float32)\n"
      "_model = GPTLMHeadModel(_cfg)\n"
      "_params = _model.init(_jax.random.PRNGKey(0), _jnp.zeros((1, 8), _jnp.int32))\n"
      "def _gen(ids, max_new):\n"
      "    import numpy as np\n"
      "    toks = list(ids)\n"
      "    out = []\n"
      "    for _ in range(max_new):\n"
      "        logits, _n = _model.apply(_params, _jnp.asarray([toks], _jnp.int32))\n"
      "        t = int(logits[0, -1].argmax())\n"
      "        out.append(t); toks.append(t)\n"
      "    return out\n"
      "_fns['generate'] = _gen\n";
  if (xfa_exec(setup) != 0) {
    fprintf(stderr, "exec failed: %s\n", xfa_get_error());
    return 1;
  }
  int32_t prompt[4] = {1, 2, 3, 4};
  int32_t out_toks[8];
  int got = xfa_generate(prompt, 4, out_toks, 8);
  if (got != 8) {
    fprintf(stderr, "generate failed (%d): %s\n", got, xfa_get_error());
    return 1;
  }
  printf("generate ok:");
  for (int i = 0; i < got; ++i) printf(" %d", out_toks[i]);
  printf("\n");
  return 0;
}
