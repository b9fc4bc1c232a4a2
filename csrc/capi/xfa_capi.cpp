// C API for embedding the TPU framework in non-Python hosts.
//
// TPU-native counterpart of the reference's csrc/capi/ layer
// (csrc/capi/flash_attn.h:8-319): the reference exposes its CUDA kernels as
// extern "C" symbols so an external framework can dlopen one library and
// drive attention without linking torch. On TPU the kernels are XLA
// executables owned by the JAX runtime, so the embeddable unit is one level
// higher: this library embeds CPython, boots the framework once, and exposes
// a small extern "C" surface (attention forward, generation) that a C++
// serving host can dlopen the same way.
//
// Error handling mirrors the reference: no exceptions across the ABI, a
// thread-local error string retrievable with xfa_get_error()
// (≙ FLASHATTNLIB_BEGIN_FUNC / flash_attn_error, csrc/capi/flash_attn.cu:45-67).
//
// Build: see csrc/capi/Makefile. Link: dlopen("libxfa_capi.so") +
// dlsym the functions below. All array arguments are host buffers; the
// library moves them to/from the TPU.

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>

namespace {

thread_local std::string g_error;
std::once_flag g_init_once;
bool g_py_owner = false;

void set_error(const char* what) { g_error = what ? what : "unknown error"; }

void set_error_from_python() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject* s = PyObject_Str(value);
    if (s) {
      set_error(PyUnicode_AsUTF8(s));
      Py_DECREF(s);
    }
  } else {
    set_error("python error");
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

// run a snippet in a dedicated module namespace; returns new ref or null
PyObject* run_in_ns(const char* code, PyObject* ns) {
  PyObject* result =
      PyRun_String(code, Py_file_input, ns, ns);
  return result;
}

PyObject* g_ns = nullptr;  // module namespace holding the booted framework

bool ensure_init() {
  bool ok = true;
  std::call_once(g_init_once, [&] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      g_py_owner = true;
    }
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* main = PyImport_AddModule("__xfa_capi__");
    g_ns = PyModule_GetDict(main);
    Py_INCREF(g_ns);
    PyObject* r = run_in_ns(
        "import os as _os\n"
        "import numpy as _np\n"
        "import ml_dtypes as _mld\n"
        "import jax as _jax, jax.numpy as _jnp\n"
        // an embedding host that sets JAX_PLATFORMS=cpu means it: the
        // sandbox's sitecustomize force-registers the axon TPU backend
        // and overrides the env var, so re-assert it here
        "if _os.environ.get('JAX_PLATFORMS', '').strip() == 'cpu':\n"
        "    _jax.config.update('jax_platforms', 'cpu')\n"
        "import xhy_flash_attention_tpu as _xfa\n"
        "from xhy_flash_attention_tpu import capi_bridge as _bridge\n"
        "_fns = {}\n",
        g_ns);
    if (!r) {
      set_error_from_python();
      ok = false;
    }
    Py_XDECREF(r);
    PyGILState_Release(gil);
  });
  return ok && g_ns != nullptr;
}

// wrap a host fp32 buffer as a numpy array inside the namespace
bool put_array(const char* name, const float* data, const int64_t* shape,
               int ndim) {
  std::string code = "import numpy as _np\n";
  // create the destination buffer then memcpy via a bytes object would copy
  // twice; use a frombuffer on a memoryview we create through ctypes-free
  // API: simplest robust path is building from a Python bytes copy.
  Py_ssize_t total = 1;
  for (int i = 0; i < ndim; ++i) total *= shape[i];
  PyObject* bytes =
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(data),
                                total * sizeof(float));
  if (!bytes) return false;
  PyDict_SetItemString(g_ns, "_buf", bytes);
  Py_DECREF(bytes);
  std::string dims = "(";
  for (int i = 0; i < ndim; ++i) dims += std::to_string(shape[i]) + ",";
  dims += ")";
  code = std::string(name) +
         " = _np.frombuffer(_buf, dtype=_np.float32).reshape" + dims +
         ".copy()\n";
  PyObject* r = run_in_ns(code.c_str(), g_ns);
  if (!r) return false;
  Py_DECREF(r);
  return true;
}

// ---- dtype-generic marshalling (new typed surface) ------------------------

const char* np_dtype_expr(int dtype) {
  return dtype == 1 ? "_mld.bfloat16" : "_np.float32";
}

size_t dtype_size(int dtype) { return dtype == 1 ? 2 : 4; }

// Bind a host buffer as `name` (numpy array) in the namespace; data may be
// null -> name = None.
bool put_buf(const char* name, const void* data, const int64_t* shape,
             int ndim, const char* np_dtype, size_t elem_size) {
  if (!data) {
    std::string code = std::string(name) + " = None\n";
    PyObject* r = run_in_ns(code.c_str(), g_ns);
    if (!r) return false;
    Py_DECREF(r);
    return true;
  }
  Py_ssize_t total = 1;
  for (int i = 0; i < ndim; ++i) total *= shape[i];
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(data), total * elem_size);
  if (!bytes) return false;
  PyDict_SetItemString(g_ns, "_buf", bytes);
  Py_DECREF(bytes);
  std::string dims = "(";
  for (int i = 0; i < ndim; ++i) dims += std::to_string(shape[i]) + ",";
  dims += ")";
  std::string code = std::string(name) + " = _np.frombuffer(_buf, dtype=" +
                     np_dtype + ").reshape" + dims + ".copy()\n";
  PyObject* r = run_in_ns(code.c_str(), g_ns);
  if (!r) return false;
  Py_DECREF(r);
  return true;
}

// Copy the named array's raw bytes into a host buffer of expect_bytes.
bool get_buf(const char* name, void* out, int64_t expect_bytes) {
  std::string code = std::string("_out_bytes = _np.ascontiguousarray(") +
                     name + ").tobytes()\n";
  PyObject* r = run_in_ns(code.c_str(), g_ns);
  if (!r) return false;
  Py_DECREF(r);
  PyObject* b = PyDict_GetItemString(g_ns, "_out_bytes");
  if (!b || !PyBytes_Check(b)) return false;
  if (PyBytes_Size(b) != expect_bytes) {
    set_error("output size mismatch");
    return false;
  }
  std::memcpy(out, PyBytes_AsString(b), expect_bytes);
  return true;
}

std::string fmt_call_tail(float p_dropout, uint64_t seed,
                          float softmax_scale, int causal, int window_left,
                          int window_right, float softcap) {
  char buf[256];
  std::snprintf(buf, sizeof(buf),
                "%.9g, %llu, %.9g, %d, %d, %d, %.9g)\n",
                p_dropout, static_cast<unsigned long long>(seed),
                softmax_scale, causal, window_left, window_right, softcap);
  return std::string(buf);
}

bool get_array(const char* name, float* out, int64_t expect_elems) {
  std::string code = std::string("_out_bytes = _np.ascontiguousarray(") +
                     name + ", dtype=_np.float32).tobytes()\n";
  PyObject* r = run_in_ns(code.c_str(), g_ns);
  if (!r) return false;
  Py_DECREF(r);
  PyObject* b = PyDict_GetItemString(g_ns, "_out_bytes");
  if (!b || !PyBytes_Check(b)) return false;
  Py_ssize_t n = PyBytes_Size(b);
  if (n != expect_elems * static_cast<int64_t>(sizeof(float))) {
    set_error("output size mismatch");
    return false;
  }
  std::memcpy(out, PyBytes_AsString(b), n);
  return true;
}

}  // namespace

extern "C" {

const char* xfa_get_error() { return g_error.c_str(); }

// Initialize the embedded runtime. Returns 0 on success.
int xfa_init() {
  if (!ensure_init()) return 1;
  return 0;
}

// Flash-attention forward on host fp32 buffers.
// q: (b, h, sq, d); k/v: (b, hk, sk, d); out: (b, h, sq, d).
// causal: 0/1. softmax_scale <= 0 picks 1/sqrt(d).
// (≙ flash_attn_fwd, csrc/capi/flash_attn.h:11-60)
int xfa_flash_attn_fwd(const float* q, const float* k, const float* v,
                       float* out, int64_t b, int64_t h, int64_t hk,
                       int64_t sq, int64_t sk, int64_t d, int causal,
                       float softmax_scale) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    int64_t qs[4] = {b, h, sq, d}, ks[4] = {b, hk, sk, d};
    if (!put_array("_q", q, qs, 4) || !put_array("_k", k, ks, 4) ||
        !put_array("_v", v, ks, 4)) {
      set_error_from_python();
      break;
    }
    char code[512];
    std::snprintf(
        code, sizeof(code),
        "_scale = %f if %f > 0 else (_q.shape[-1] ** -0.5)\n"
        "_o = _xfa.flash_attention(_jnp.asarray(_q), _jnp.asarray(_k), "
        "_jnp.asarray(_v), softmax_scale=_scale, causal=bool(%d))\n"
        "_o = _np.asarray(_o)\n",
        softmax_scale, softmax_scale, causal);
    PyObject* r = run_in_ns(code, g_ns);
    if (!r) {
      set_error_from_python();
      break;
    }
    Py_DECREF(r);
    if (!get_array("_o", out, b * h * sq * d)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

// Greedy generation with a GPT-skeleton model previously loaded via
// xfa_load_model (below). prompt: (prompt_len,) int32 token ids;
// out: caller buffer of capacity max_new; returns #tokens written or -1.
int xfa_generate(const int32_t* prompt, int64_t prompt_len, int32_t* out,
                 int64_t max_new) {
  if (!ensure_init()) return -1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = -1;
  do {
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(prompt),
        prompt_len * sizeof(int32_t));
    if (!bytes) break;
    PyDict_SetItemString(g_ns, "_buf", bytes);
    Py_DECREF(bytes);
    char code[512];
    std::snprintf(
        code, sizeof(code),
        "_ids = _np.frombuffer(_buf, dtype=_np.int32)\n"
        "assert '_model' in dir(), 'call xfa_load_model first'\n"
        "_toks = _fns['generate'](_ids, %lld)\n"
        "_out_bytes = _np.asarray(_toks, _np.int32).tobytes()\n",
        static_cast<long long>(max_new));
    PyObject* r = run_in_ns(code, g_ns);
    if (!r) {
      set_error_from_python();
      break;
    }
    Py_DECREF(r);
    PyObject* b = PyDict_GetItemString(g_ns, "_out_bytes");
    if (!b) break;
    Py_ssize_t n = PyBytes_Size(b) / sizeof(int32_t);
    if (n > max_new) n = max_new;
    std::memcpy(out, PyBytes_AsString(b), n * sizeof(int32_t));
    rc = static_cast<int>(n);
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

// Run arbitrary setup code in the embedded namespace (model loading,
// engine construction). The snippet must define _model and
// _fns['generate'](ids, max_new) -> list[int]. Returns 0 on success.
// (≙ the reference's expectation that the host framework owns model setup
// and only the kernel entry points cross the ABI.)
int xfa_exec(const char* code) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* r = run_in_ns(code, g_ns);
  int rc = 0;
  if (!r) {
    set_error_from_python();
    rc = 1;
  }
  Py_XDECREF(r);
  PyGILState_Release(gil);
  return rc;
}

// ---- typed surface (≙ reference capi/flash_attn.h:11-319) ----------------

namespace {

// shared marshalling for the dense fwd/bwd: binds q/k/v (+bias/flashmask)
bool put_dense_inputs(const void* q, const void* k, const void* v,
                      const float* bias, const int32_t* flashmask,
                      int64_t b, int64_t sq, int64_t sk, int64_t h,
                      int64_t hk, int64_t d, int64_t bias_b, int64_t bias_h,
                      int64_t fm_heads, int64_t fm_nvec, int dtype) {
  const char* npd = np_dtype_expr(dtype);
  size_t es = dtype_size(dtype);
  int64_t qs[4] = {b, sq, h, d}, ks[4] = {b, sk, hk, d};
  int64_t bs[4] = {bias_b, bias_h, sq, sk};
  int64_t fs[4] = {b, fm_heads, sk, fm_nvec};
  return put_buf("_q", q, qs, 4, npd, es) &&
         put_buf("_k", k, ks, 4, npd, es) &&
         put_buf("_v", v, ks, 4, npd, es) &&
         put_buf("_bias", bias, bs, 4, "_np.float32", 4) &&
         put_buf("_fm", flashmask, fs, 4, "_np.int32", 4);
}

}  // namespace

int xfa_attn_fwd(const void* q, const void* k, const void* v,
                 const float* bias, const int32_t* flashmask,
                 void* out, float* softmax_lse,
                 int64_t b, int64_t sq, int64_t sk,
                 int64_t h, int64_t hk, int64_t d,
                 int64_t bias_b, int64_t bias_h,
                 int64_t fm_heads, int64_t fm_nvec,
                 int dtype, float p_dropout, uint64_t seed,
                 float softmax_scale, int causal,
                 int window_left, int window_right, float softcap) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    if (!put_dense_inputs(q, k, v, bias, flashmask, b, sq, sk, h, hk, d,
                          bias_b, bias_h, fm_heads, fm_nvec, dtype)) {
      set_error_from_python();
      break;
    }
    std::string code =
        "_o, _lse = _bridge.attn_fwd(_q, _k, _v, _bias, _fm, " +
        fmt_call_tail(p_dropout, seed, softmax_scale, causal, window_left,
                      window_right, softcap);
    PyObject* r = run_in_ns(code.c_str(), g_ns);
    if (!r) { set_error_from_python(); break; }
    Py_DECREF(r);
    if (!get_buf("_o", out, b * sq * h * d * dtype_size(dtype))) {
      set_error_from_python();
      break;
    }
    if (softmax_lse &&
        !get_buf("_lse", softmax_lse, b * h * sq * 4)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

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
                 int window_left, int window_right, float softcap) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    if (!put_dense_inputs(q, k, v, bias, flashmask, b, sq, sk, h, hk, d,
                          bias_b, bias_h, fm_heads, fm_nvec, dtype)) {
      set_error_from_python();
      break;
    }
    const char* npd = np_dtype_expr(dtype);
    size_t es = dtype_size(dtype);
    int64_t qs[4] = {b, sq, h, d};
    int64_t ls[3] = {b, h, sq};
    if (!put_buf("_do", dout, qs, 4, npd, es) ||
        !put_buf("_out", out, qs, 4, npd, es) ||
        !put_buf("_lse", softmax_lse, ls, 3, "_np.float32", 4)) {
      set_error_from_python();
      break;
    }
    std::string code =
        "_dq, _dk, _dv, _dbias = _bridge.attn_bwd(_do, _q, _k, _v, _out, "
        "_lse, _bias, _fm, " +
        fmt_call_tail(p_dropout, seed, softmax_scale, causal, window_left,
                      window_right, softcap);
    PyObject* r = run_in_ns(code.c_str(), g_ns);
    if (!r) { set_error_from_python(); break; }
    Py_DECREF(r);
    if (!get_buf("_dq", dq, b * sq * h * d * es) ||
        !get_buf("_dk", dk, b * sk * hk * d * es) ||
        !get_buf("_dv", dv, b * sk * hk * d * es)) {
      set_error_from_python();
      break;
    }
    if (dbias && bias &&
        !get_buf("_dbias", dbias, bias_b * bias_h * sq * sk * 4)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

int xfa_attn_varlen_fwd(const void* q, const void* k, const void* v,
                        const int32_t* cu_seqlens_q,
                        const int32_t* cu_seqlens_k,
                        void* out, float* softmax_lse,
                        int64_t total_q, int64_t total_k, int64_t batch,
                        int64_t h, int64_t hk, int64_t d,
                        int dtype, float p_dropout, uint64_t seed,
                        float softmax_scale, int causal,
                        int window_left, int window_right, float softcap) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    const char* npd = np_dtype_expr(dtype);
    size_t es = dtype_size(dtype);
    int64_t qs[3] = {total_q, h, d}, ks[3] = {total_k, hk, d};
    int64_t cs[1] = {batch + 1};
    if (!put_buf("_q", q, qs, 3, npd, es) ||
        !put_buf("_k", k, ks, 3, npd, es) ||
        !put_buf("_v", v, ks, 3, npd, es) ||
        !put_buf("_cuq", cu_seqlens_q, cs, 1, "_np.int32", 4) ||
        !put_buf("_cuk", cu_seqlens_k, cs, 1, "_np.int32", 4)) {
      set_error_from_python();
      break;
    }
    std::string code =
        "_o, _lse = _bridge.varlen_fwd(_q, _k, _v, _cuq, _cuk, " +
        fmt_call_tail(p_dropout, seed, softmax_scale, causal, window_left,
                      window_right, softcap);
    PyObject* r = run_in_ns(code.c_str(), g_ns);
    if (!r) { set_error_from_python(); break; }
    Py_DECREF(r);
    if (!get_buf("_o", out, total_q * h * d * es)) {
      set_error_from_python();
      break;
    }
    if (softmax_lse && !get_buf("_lse", softmax_lse, h * total_q * 4)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

int xfa_attn_varlen_bwd(const void* dout, const void* q, const void* k,
                        const void* v,
                        const int32_t* cu_seqlens_q,
                        const int32_t* cu_seqlens_k,
                        void* dq, void* dk, void* dv,
                        int64_t total_q, int64_t total_k, int64_t batch,
                        int64_t h, int64_t hk, int64_t d,
                        int dtype, float p_dropout, uint64_t seed,
                        float softmax_scale, int causal,
                        int window_left, int window_right, float softcap) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    const char* npd = np_dtype_expr(dtype);
    size_t es = dtype_size(dtype);
    int64_t qs[3] = {total_q, h, d}, ks[3] = {total_k, hk, d};
    int64_t cs[1] = {batch + 1};
    if (!put_buf("_q", q, qs, 3, npd, es) ||
        !put_buf("_k", k, ks, 3, npd, es) ||
        !put_buf("_v", v, ks, 3, npd, es) ||
        !put_buf("_do", dout, qs, 3, npd, es) ||
        !put_buf("_cuq", cu_seqlens_q, cs, 1, "_np.int32", 4) ||
        !put_buf("_cuk", cu_seqlens_k, cs, 1, "_np.int32", 4)) {
      set_error_from_python();
      break;
    }
    std::string code =
        "_dq, _dk, _dv = _bridge.varlen_bwd(_do, _q, _k, _v, _cuq, _cuk, " +
        fmt_call_tail(p_dropout, seed, softmax_scale, causal, window_left,
                      window_right, softcap);
    PyObject* r = run_in_ns(code.c_str(), g_ns);
    if (!r) { set_error_from_python(); break; }
    Py_DECREF(r);
    if (!get_buf("_dq", dq, total_q * h * d * es) ||
        !get_buf("_dk", dk, total_k * hk * d * es) ||
        !get_buf("_dv", dv, total_k * hk * d * es)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

int xfa_calc_reduced_attn_scores(const void* q, const void* k,
                                 const float* softmax_lse, float* reduced,
                                 int64_t b, int64_t sq, int64_t sk,
                                 int64_t h, int64_t hk, int64_t d,
                                 int dtype, float softmax_scale,
                                 int causal) {
  if (!ensure_init()) return 1;
  PyGILState_STATE gil = PyGILState_Ensure();
  int rc = 1;
  do {
    const char* npd = np_dtype_expr(dtype);
    size_t es = dtype_size(dtype);
    int64_t qs[4] = {b, sq, h, d}, ks[4] = {b, sk, hk, d};
    int64_t ls[3] = {b, h, sq};
    if (!put_buf("_q", q, qs, 4, npd, es) ||
        !put_buf("_k", k, ks, 4, npd, es) ||
        !put_buf("_lse", softmax_lse, ls, 3, "_np.float32", 4)) {
      set_error_from_python();
      break;
    }
    char code[160];
    std::snprintf(code, sizeof(code),
                  "_red = _bridge.reduced_scores(_q, _k, _lse, %d, %.9g)\n",
                  causal, softmax_scale);
    PyObject* r = run_in_ns(code, g_ns);
    if (!r) { set_error_from_python(); break; }
    Py_DECREF(r);
    if (!get_buf("_red", reduced, b * h * sk * 4)) {
      set_error_from_python();
      break;
    }
    rc = 0;
  } while (false);
  PyGILState_Release(gil);
  return rc;
}

void xfa_shutdown() {
  if (g_py_owner && Py_IsInitialized()) {
    PyGILState_Ensure();
    Py_XDECREF(g_ns);
    g_ns = nullptr;
    Py_Finalize();
  }
}

}  // extern "C"
