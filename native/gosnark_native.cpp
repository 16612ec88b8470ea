// gosnark_native — host-side 256-bit arithmetic runtime.
//
// The TPU owns the batched compute (ops/*.py); this library owns the
// host-side hot paths that would otherwise be python-int loops:
//
//   * batch conversion python-int byte vectors <-> the (32, N) int32
//     Montgomery limb layout the TPU kernels consume ("pack"/"unpack");
//   * sparse R1CS matvec A·w mod r (the fast prover's row_evals);
//   * sequential field-mode witness evaluation for compiled circuits.
//
// 256-bit elements are 4x uint64 little-endian; multiplication is CIOS
// Montgomery with __int128 partial products.  The modulus is a runtime
// parameter (one context per field: Fr for witness/poly work, Fq if needed).
//
// C ABI only (consumed via ctypes from go_snark_study_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>

typedef unsigned __int128 u128;

struct FieldCtx {
  uint64_t p[4];    // modulus, little-endian
  uint64_t r2[4];   // R^2 mod p (R = 2^256)
  uint64_t n0;      // -p^-1 mod 2^64
};

namespace {

inline bool geq(const uint64_t a[4], const uint64_t b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_p(uint64_t a[4], const uint64_t p[4]) {
  unsigned char borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - p[i] - borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;  // two's-complement borrow propagates
  }
}

inline void add_mod(uint64_t out[4], const uint64_t a[4], const uint64_t b[4],
                    const uint64_t p[4]) {
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (u128)a[i] + b[i];
    out[i] = (uint64_t)c;
    c >>= 64;
  }
  if (c || geq(out, p)) sub_p(out, p);
}

// CIOS Montgomery multiply: out = a*b*R^-1 mod p.
inline void mont_mul(uint64_t out[4], const uint64_t a[4], const uint64_t b[4],
                     const FieldCtx* ctx) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  const uint64_t* p = ctx->p;
  for (int i = 0; i < 4; ++i) {
    u128 c = 0;
    for (int j = 0; j < 4; ++j) {
      c += (u128)t[j] + (u128)a[i] * b[j];
      t[j] = (uint64_t)c;
      c >>= 64;
    }
    c += t[4];
    t[4] = (uint64_t)c;
    t[5] = (uint64_t)(c >> 64);

    uint64_t m = t[0] * ctx->n0;
    c = (u128)t[0] + (u128)m * p[0];
    c >>= 64;
    for (int j = 1; j < 4; ++j) {
      c += (u128)t[j] + (u128)m * p[j];
      t[j - 1] = (uint64_t)c;
      c >>= 64;
    }
    c += t[4];
    t[3] = (uint64_t)c;
    t[4] = t[5] + (uint64_t)(c >> 64);
    t[5] = 0;
  }
  for (int i = 0; i < 4; ++i) out[i] = t[i];
  if (t[4] || geq(out, p)) sub_p(out, p);
}

inline void mont_sqr_n(uint64_t x[4], int n, const FieldCtx* ctx) {
  for (int i = 0; i < n; ++i) mont_mul(x, x, x, ctx);
}

// out = x^e mod p (x, out in Montgomery form), e little-endian 4x64
inline void mont_pow(uint64_t out[4], const uint64_t x[4], const uint64_t e[4],
                     const FieldCtx* ctx, const uint64_t one_mont[4]) {
  uint64_t acc[4];
  memcpy(acc, one_mont, 32);
  for (int i = 3; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      mont_mul(acc, acc, acc, ctx);
      if ((e[i] >> b) & 1) mont_mul(acc, acc, x, ctx);
    }
  }
  memcpy(out, acc, 32);
}

inline void to_mont(uint64_t out[4], const uint64_t a[4], const FieldCtx* ctx) {
  mont_mul(out, a, ctx->r2, ctx);
}

inline void from_mont(uint64_t out[4], const uint64_t a[4], const FieldCtx* ctx) {
  uint64_t one[4] = {1, 0, 0, 0};
  mont_mul(out, a, one, ctx);
}

}  // namespace

extern "C" {

// p_bytes: 32-byte little-endian modulus.  Returns an opaque context.
FieldCtx* gosnark_ctx_new(const uint8_t* p_bytes) {
  FieldCtx* ctx = (FieldCtx*)malloc(sizeof(FieldCtx));
  memcpy(ctx->p, p_bytes, 32);
  // n0 = -p^-1 mod 2^64 (Newton iteration)
  uint64_t p0 = ctx->p[0];
  uint64_t inv = 1;
  for (int i = 0; i < 6; ++i) inv *= 2 - p0 * inv;
  ctx->n0 = (uint64_t)(0 - inv);
  // R^2 mod p by 512 doublings of 1
  uint64_t acc[4] = {1, 0, 0, 0};
  for (int i = 0; i < 512; ++i) add_mod(acc, acc, acc, ctx->p);
  memcpy(ctx->r2, acc, 32);
  return ctx;
}

void gosnark_ctx_free(FieldCtx* ctx) { free(ctx); }

// n values of 32 little-endian bytes -> limb-major int32 (32, n) layout
// (out[limb*n + i]), converted to the Montgomery domain when mont != 0.
void gosnark_pack(const FieldCtx* ctx, const uint8_t* in, int32_t* out,
                  int64_t n, int mont) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t v[4];
    memcpy(v, in + i * 32, 32);
    uint64_t m[4];
    if (mont) {
      to_mont(m, v, ctx);
    } else {
      memcpy(m, v, 32);
    }
    const uint8_t* bytes = (const uint8_t*)m;
    for (int j = 0; j < 32; ++j) out[(int64_t)j * n + i] = bytes[j];
  }
}

// inverse of gosnark_pack
void gosnark_unpack(const FieldCtx* ctx, const int32_t* in, uint8_t* out,
                    int64_t n, int mont) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t m[4] = {0, 0, 0, 0};
    uint8_t* bytes = (uint8_t*)m;
    for (int j = 0; j < 32; ++j) bytes[j] = (uint8_t)in[(int64_t)j * n + i];
    uint64_t v[4];
    if (mont) {
      from_mont(v, m, ctx);
    } else {
      memcpy(v, m, 32);
    }
    memcpy(out + i * 32, v, 32);
  }
}

// CSR sparse matvec over the field: out[row] = sum vals[k] * w[cols[k]].
// w: n_signals x 32 bytes (plain residues); vals: int64 (negatives allowed);
// out: n_rows x 32 bytes.
void gosnark_sparse_matvec(const FieldCtx* ctx, const int64_t* indptr,
                           const int64_t* cols, const int64_t* vals,
                           const uint8_t* w, int64_t n_rows, uint8_t* out) {
  for (int64_t row = 0; row < n_rows; ++row) {
    uint64_t acc[4] = {0, 0, 0, 0};
    for (int64_t k = indptr[row]; k < indptr[row + 1]; ++k) {
      uint64_t wv[4];
      memcpy(wv, w + cols[k] * 32, 32);
      int64_t val = vals[k];
      uint64_t term[4];
      if (val == 1) {
        memcpy(term, wv, 32);
      } else {
        uint64_t neg = 0;
        uint64_t va = (uint64_t)(val < 0 ? -val : val);
        if (val < 0) neg = 1;
        // term = (va * wv) mod p  via  mont_mul(wv, va*R mod p)... cheaper:
        // schoolbook 4x1 then one Montgomery fold: do to_mont(va), mont_mul.
        uint64_t vm[4] = {va, 0, 0, 0};
        uint64_t va_m[4];
        to_mont(va_m, vm, ctx);
        uint64_t prod_m[4];
        mont_mul(prod_m, va_m, wv, ctx);  // = va*wv*... (wv plain) -> va*wv (plain)
        memcpy(term, prod_m, 32);
        if (neg) {
          // term = p - term (term != 0 case; if 0 stays 0)
          uint64_t zero[4] = {0, 0, 0, 0};
          bool is_zero = !(term[0] | term[1] | term[2] | term[3]);
          if (!is_zero) {
            uint64_t t2[4];
            memcpy(t2, ctx->p, 32);
            unsigned char borrow = 0;
            for (int j = 0; j < 4; ++j) {
              u128 d = (u128)t2[j] - term[j] - borrow;
              t2[j] = (uint64_t)d;
              borrow = (d >> 64) ? 1 : 0;
            }
            memcpy(term, t2, 32);
          } else {
            memcpy(term, zero, 32);
          }
        }
      }
      add_mod(acc, acc, term, ctx->p);
    }
    memcpy(out + row * 32, acc, 32);
  }
}

// Field-mode witness evaluation for compiled circuits.
// ops encoding per constraint (7 int64s):
//   [op, v1_kind, v1, v2_kind, v2, out_idx, _pad]
//   op: 0 '+', 1 '-', 2 '*', 3 '/', 4 'in' (skip)
//   kind: 0 = literal value (v fits int64, >= 0), 1 = signal index
// w: n_signals x 32 bytes, pre-seeded with one/public/private inputs.
// Returns 0 on success, -1 on division by zero.
int gosnark_witness_eval(const FieldCtx* ctx, const int64_t* ops,
                         int64_t n_ops, uint8_t* w) {
  uint64_t one_mont[4] = {1, 0, 0, 0};
  to_mont(one_mont, one_mont, ctx);
  // p - 2 for Fermat inversion
  uint64_t pm2[4];
  memcpy(pm2, ctx->p, 32);
  {
    u128 d = (u128)pm2[0] - 2;
    pm2[0] = (uint64_t)d;
    unsigned char borrow = (d >> 64) ? 1 : 0;
    for (int j = 1; j < 4 && borrow; ++j) {
      u128 e = (u128)pm2[j] - borrow;
      pm2[j] = (uint64_t)e;
      borrow = (e >> 64) ? 1 : 0;
    }
  }

  for (int64_t c = 0; c < n_ops; ++c) {
    const int64_t* op = ops + c * 7;
    if (op[0] == 4) continue;  // 'in'
    uint64_t v1[4] = {0, 0, 0, 0}, v2[4] = {0, 0, 0, 0};
    if (op[1] == 0) {
      v1[0] = (uint64_t)op[2];
    } else {
      memcpy(v1, w + op[2] * 32, 32);
    }
    if (op[3] == 0) {
      v2[0] = (uint64_t)op[4];
    } else {
      memcpy(v2, w + op[4] * 32, 32);
    }
    uint64_t res[4] = {0, 0, 0, 0};
    switch (op[0]) {
      case 0:
        add_mod(res, v1, v2, ctx->p);
        break;
      case 1: {  // v1 - v2 = v1 + (p - v2)
        uint64_t nv2[4];
        bool z = !(v2[0] | v2[1] | v2[2] | v2[3]);
        if (z) {
          memcpy(res, v1, 32);
        } else {
          memcpy(nv2, ctx->p, 32);
          unsigned char borrow = 0;
          for (int j = 0; j < 4; ++j) {
            u128 d = (u128)nv2[j] - v2[j] - borrow;
            nv2[j] = (uint64_t)d;
            borrow = (d >> 64) ? 1 : 0;
          }
          add_mod(res, v1, nv2, ctx->p);
        }
        break;
      }
      case 2: {  // v1 * v2 (plain residues): two Montgomery muls
        uint64_t m1[4];
        to_mont(m1, v1, ctx);
        mont_mul(res, m1, v2, ctx);
        break;
      }
      case 3: {  // v1 / v2 = v1 * v2^(p-2)
        bool z = !(v2[0] | v2[1] | v2[2] | v2[3]);
        if (z) return -1;
        uint64_t m2[4], inv_m[4], m1[4], prod_m[4];
        to_mont(m2, v2, ctx);
        mont_pow(inv_m, m2, pm2, ctx, one_mont);  // (v2^-1) in mont form
        to_mont(m1, v1, ctx);
        mont_mul(prod_m, m1, inv_m, ctx);  // v1 * v2^-1 * R ... -> plain
        from_mont(res, prod_m, ctx);
        to_mont(res, res, ctx);  // normalize path kept simple
        from_mont(res, res, ctx);
        break;
      }
    }
    memcpy(w + op[5] * 32, res, 32);
  }
  return 0;
}

int gosnark_abi_version(void) { return 1; }
}
