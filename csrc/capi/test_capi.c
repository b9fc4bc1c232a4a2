/* Smoke test for the embeddable C API: boot the runtime from plain C,
 * run flash attention forward, and greedy-generate from a tiny random
 * model — the same "external framework dlopens one library" usage the
 * reference's csrc/capi serves. */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

extern int xfa_init(void);
extern const char* xfa_get_error(void);
extern int xfa_flash_attn_fwd(const float*, const float*, const float*,
                              float*, int64_t, int64_t, int64_t, int64_t,
                              int64_t, int64_t, int, float);
extern int xfa_exec(const char*);
extern int xfa_generate(const int32_t*, int64_t, int32_t*, int64_t);

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
