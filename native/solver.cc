// Native witness-solver core: 4x64-limb Montgomery field arithmetic +
// instruction-ordered R1CS solving.
//
// Role parity: gnark-crypto's amd64-assembly fr.Element arithmetic
// (reference README.md:66-68) + the generated level-parallel solver
// (constraint/bn254/solver.go:426-540). The Python side orchestrates hint
// instructions (arbitrary host code, solver.go:205) and hands contiguous
// R1C runs to this core; all state lives in shared numpy buffers.
//
// Field-generic: any odd prime < 2^256 (both curves' fr). Values are
// little-endian 4x64 limbs in Montgomery form (R = 2^256).
//
// Build: g++ -O3 -shared -fPIC -o libsolver.so solver.cc  (see native.py)

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct Field {
  u64 p[4];     // modulus
  u64 inv;      // -p^-1 mod 2^64
};

inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_p(u64 a[4], const u64 p[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - p[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void fadd(const Field& f, const u64 a[4], const u64 b[4], u64 out[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(out, f.p)) sub_p(out, f.p);
}

inline void fsub(const Field& f, const u64 a[4], const u64 b[4], u64 out[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {  // add p back
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)out[i] + f.p[i] + carry;
      out[i] = (u64)s;
      carry = s >> 64;
    }
  }
}

// CIOS Montgomery multiplication (Koc et al.)
inline void fmul(const Field& f, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);
    // m = t[0] * inv mod 2^64; t += m*p; t >>= 64
    u64 m = t[0] * f.inv;
    carry = ((u128)m * f.p[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)m * f.p[j] + t[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[4] + carry;
    t[3] = (u64)s3;
    t[4] = t[5] + (u64)(s3 >> 64);
    t[5] = 0;
  }
  out[0] = t[0]; out[1] = t[1]; out[2] = t[2]; out[3] = t[3];
  if (t[4] || geq(out, f.p)) sub_p(out, f.p);
}

inline bool is_zero(const u64 a[4]) {
  return (a[0] | a[1] | a[2] | a[3]) == 0;
}

// a^e mod p (Montgomery), e plain 4x64
void fpow(const Field& f, const u64 a[4], const u64 e[4], const u64 one[4],
          u64 out[4]) {
  u64 base[4], acc[4];
  std::memcpy(base, a, 32);
  std::memcpy(acc, one, 32);
  for (int w = 0; w < 4; ++w) {
    u64 bits = e[w];
    for (int i = 0; i < 64; ++i) {
      if ((w * 64 + i) >= 256) break;
      if (bits & 1) fmul(f, acc, base, acc);
      bits >>= 1;
      fmul(f, base, base, base);
    }
  }
  std::memcpy(out, acc, 32);
}

inline void finv(const Field& f, const u64 a[4], const u64 one[4],
                 u64 out[4]) {
  // Fermat: a^(p-2)
  u64 e[4];
  u128 borrow = 2;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)f.p[i] - (u64)borrow;
    e[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  fpow(f, a, e, one, out);
}

}  // namespace

extern "C" {

// Evaluate + solve a contiguous run of R1C instructions.
//   coeffs:      (n_coeffs, 4) Montgomery coefficient table
//   term_coeff:  (n_terms,) uint32 coefficient ids
//   term_wire:   (n_terms,) uint32 wire ids
//   l_off/r_off/o_off: per-constraint term ranges; l_off has n_cons+1 rows
//   solved_wire: (n_cons,) int64, -1 = check only
//   order:       (n_run,) int64 constraint indices to process, in order
//   wires:       (n_wires, 4) Montgomery values (in/out)
//   assigned:    (n_wires,) uint8 flags (in/out)
//   abc:         (3, n_cons, 4) output evaluation vectors
//   one_mont:    Montgomery 1
// Returns -1 on success, else the failing constraint index.
long long r1cs_solve_run(
    const u64* p_limbs, u64 inv,
    const u64* coeffs,
    const uint32_t* term_coeff, const uint32_t* term_wire,
    const long long* l_off, const long long* r_off, const long long* o_off,
    const long long* solved_wire,
    const long long* order, long long n_run, long long n_cons,
    u64* wires, uint8_t* assigned,
    u64* abc, const u64* one_mont) {
  Field f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;

  for (long long r = 0; r < n_run; ++r) {
    long long j = order[r];
    long long ranges[3][2] = {
        {l_off[j], r_off[j]},
        {r_off[j], o_off[j]},
        {o_off[j], l_off[j + 1]},
    };
    long long sw = solved_wire[j];
    bool unknown = sw >= 0 && !assigned[sw];

    u64 vals[3][4] = {{0}, {0}, {0}};
    u64 unk_coeff[3][4] = {{0}, {0}, {0}};
    bool has_unk[3] = {false, false, false};

    for (int s = 0; s < 3; ++s) {
      for (long long t = ranges[s][0]; t < ranges[s][1]; ++t) {
        uint32_t w = term_wire[t];
        const u64* c = coeffs + 4 * term_coeff[t];
        if (unknown && (long long)w == sw) {
          fadd(f, unk_coeff[s], c, unk_coeff[s]);
          has_unk[s] = true;
          continue;
        }
        if (!assigned[w]) return j;  // used-before-solved
        u64 prod[4];
        fmul(f, c, wires + 4 * w, prod);
        fadd(f, vals[s], prod, vals[s]);
      }
    }

    if (unknown) {
      int n_unk = has_unk[0] + has_unk[1] + has_unk[2];
      if (n_unk != 1) return j;
      u64 x[4];
      if (has_unk[2]) {
        // L*R = O_k + c*x  ->  x = (L*R - O_k) / c
        u64 lr[4], num[4];
        fmul(f, vals[0], vals[1], lr);
        fsub(f, lr, vals[2], num);
        if (std::memcmp(unk_coeff[2], one_mont, 32) == 0) {
          // c == 1: the overwhelmingly common case (fresh output wires) —
          // skip the field inversion entirely
          std::memcpy(x, num, 32);
        } else {
          u64 ci[4];
          finv(f, unk_coeff[2], one_mont, ci);
          fmul(f, num, ci, x);
        }
      } else {
        int s = has_unk[0] ? 0 : 1;
        int o = 1 - s;  // the other mul slot
        // (V_s + c*x) * V_o = O  ->  x = (O - V_s*V_o) / (c*V_o)
        u64 den[4];
        fmul(f, unk_coeff[s], vals[o], den);
        if (is_zero(den)) return j;
        u64 pv[4], num[4], di[4];
        fmul(f, vals[s], vals[o], pv);
        fsub(f, vals[2], pv, num);
        finv(f, den, one_mont, di);
        fmul(f, num, di, x);
      }
      std::memcpy(wires + 4 * sw, x, 32);
      assigned[sw] = 1;
      // fold the unknown's contribution back into the slot values
      for (int s = 0; s < 3; ++s) {
        if (has_unk[s]) {
          u64 prod[4];
          fmul(f, unk_coeff[s], x, prod);
          fadd(f, vals[s], prod, vals[s]);
        }
      }
    }

    // check L*R == O
    u64 lr[4];
    fmul(f, vals[0], vals[1], lr);
    u64 diff[4];
    fsub(f, lr, vals[2], diff);
    if (!is_zero(diff)) return j;

    std::memcpy(abc + 4 * j, vals[0], 32);                       // a
    std::memcpy(abc + 4 * (n_cons + j), vals[1], 32);            // b
    std::memcpy(abc + 4 * (2 * n_cons + j), vals[2], 32);        // c
  }
  return -1;
}

// Solve a contiguous run of SparseR1CS gates:
//   qL·a + qR·b + qM·a·b + qO·c + qC = 0
// Columns are (n_gates, 4) Montgomery arrays; qc_extra adds the runtime Qk
// public-input column. Returns -1 on success, else the failing gate.
long long scs_solve_run(
    const u64* p_limbs, u64 inv,
    const uint32_t* xa, const uint32_t* xb, const uint32_t* xc,
    const u64* ql, const u64* qr, const u64* qm, const u64* qo,
    const u64* qc,
    const long long* solved_wire,
    const long long* order, long long n_run,
    u64* wires, uint8_t* assigned,
    u64* abc, long long n_gates, const u64* one_mont) {
  Field f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;

  for (long long r = 0; r < n_run; ++r) {
    long long j = order[r];
    uint32_t wa = xa[j], wb = xb[j], wc = xc[j];
    long long sw = solved_wire[j];
    bool in_a = (long long)wa == sw, in_b = (long long)wb == sw,
         in_c = (long long)wc == sw;
    bool unknown = sw >= 0 && !assigned[sw];

    if (unknown) {
      if ((!in_a && !assigned[wa]) || (!in_b && !assigned[wb]) ||
          (!in_c && !assigned[wc]))
        return j;
      u64 coef[4] = {0, 0, 0, 0};
      u64 cons[4];
      std::memcpy(cons, qc + 4 * j, 32);
      if (in_a) fadd(f, coef, ql + 4 * j, coef);
      else {
        u64 t[4];
        fmul(f, ql + 4 * j, wires + 4 * wa, t);
        fadd(f, cons, t, cons);
      }
      if (in_b) fadd(f, coef, qr + 4 * j, coef);
      else {
        u64 t[4];
        fmul(f, qr + 4 * j, wires + 4 * wb, t);
        fadd(f, cons, t, cons);
      }
      if (in_c) fadd(f, coef, qo + 4 * j, coef);
      else {
        u64 t[4];
        fmul(f, qo + 4 * j, wires + 4 * wc, t);
        fadd(f, cons, t, cons);
      }
      if (!is_zero(qm + 4 * j)) {
        if (in_a && in_b) return j;  // quadratic in the unknown
        u64 t[4];
        if (in_a) {
          fmul(f, qm + 4 * j, wires + 4 * wb, t);
          fadd(f, coef, t, coef);
        } else if (in_b) {
          fmul(f, qm + 4 * j, wires + 4 * wa, t);
          fadd(f, coef, t, coef);
        } else {
          fmul(f, qm + 4 * j, wires + 4 * wa, t);
          fmul(f, t, wires + 4 * wb, t);
          fadd(f, cons, t, cons);
        }
      }
      if (is_zero(coef)) return j;
      u64 x[4], zero[4] = {0, 0, 0, 0};
      u64 neg_one[4];
      fsub(f, zero, one_mont, neg_one);
      if (std::memcmp(coef, neg_one, 32) == 0) {
        // coef == -1 (the builder's qO on nearly every gate): x = const
        std::memcpy(x, cons, 32);
      } else if (std::memcmp(coef, one_mont, 32) == 0) {
        fsub(f, zero, cons, x);
      } else {
        u64 ci[4];
        fsub(f, zero, cons, cons);
        finv(f, coef, one_mont, ci);
        fmul(f, cons, ci, x);
      }
      std::memcpy(wires + 4 * sw, x, 32);
      assigned[sw] = 1;
    }

    if (!assigned[wa] || !assigned[wb] || !assigned[wc]) return j;
    const u64 *va = wires + 4 * wa, *vb = wires + 4 * wb,
              *vc = wires + 4 * wc;
    u64 acc[4], t[4];
    fmul(f, ql + 4 * j, va, acc);
    fmul(f, qr + 4 * j, vb, t);
    fadd(f, acc, t, acc);
    fmul(f, qm + 4 * j, va, t);
    fmul(f, t, vb, t);
    fadd(f, acc, t, acc);
    fmul(f, qo + 4 * j, vc, t);
    fadd(f, acc, t, acc);
    fadd(f, acc, qc + 4 * j, acc);
    if (!is_zero(acc)) return j;
    std::memcpy(abc + 4 * j, va, 32);
    std::memcpy(abc + 4 * (n_gates + j), vb, 32);
    std::memcpy(abc + 4 * (2 * n_gates + j), vc, 32);
  }
  return -1;
}

// Montgomery batch conversion helpers (R^2 supplied by the caller).
void to_mont_batch(const u64* p_limbs, u64 inv, const u64* r2,
                   u64* vals, long long n) {
  Field f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;
  for (long long i = 0; i < n; ++i) {
    fmul(f, vals + 4 * i, r2, vals + 4 * i);
  }
}

void from_mont_batch(const u64* p_limbs, u64 inv, u64* vals, long long n) {
  Field f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;
  u64 one[4] = {1, 0, 0, 0};
  for (long long i = 0; i < n; ++i) {
    fmul(f, vals + 4 * i, one, vals + 4 * i);
  }
}

}  // extern "C"

// Level-parallel variant of r1cs_solve_run: every instruction in `order`
// belongs to one dependency level (inputs produced strictly earlier), so
// iterations are independent and can run concurrently (≙ the reference's
// per-level goroutine pool, constraint/bn254/solver.go:426-532).
extern "C" long long r1cs_solve_level(
    const u64* p_limbs, u64 inv,
    const u64* coeffs,
    const uint32_t* term_coeff, const uint32_t* term_wire,
    const long long* l_off, const long long* r_off, const long long* o_off,
    const long long* solved_wire,
    const long long* order, long long n_run, long long n_cons,
    u64* wires, uint8_t* assigned,
    u64* abc, const u64* one_mont) {
  long long fail = -1;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (long long r = 0; r < n_run; ++r) {
    if (fail >= 0) continue;
    long long rc = r1cs_solve_run(
        p_limbs, inv, coeffs, term_coeff, term_wire, l_off, r_off, o_off,
        solved_wire, order + r, 1, n_cons, wires, assigned, abc, one_mont);
    if (rc >= 0) {
#ifdef _OPENMP
#pragma omp critical
#endif
      {
        if (fail < 0 || rc < fail) fail = rc;
      }
    }
  }
  return fail;
}
