// pmpc_native: host-side native runtime for pmpc_tpu.
//
// Role parity with the reference's native layer (PMPC.jl/pmpcjl/module.cpp
// flat-ABI bridge + the CPU QP solvers it links): a C ABI over dense row-major
// f64 buffers providing
//   1. canonical consensus-QP assembly (the hot host-side serving path;
//      same math as pmpc_tpu/canonical.py / PMPC.jl lqp_utils.jl), and
//   2. a from-scratch dense ADMM box-QP solver (operator-splitting iteration
//      in the style of the OSQP algorithm) used as a CPU fallback /
//      cross-check backend when no accelerator is attached.
//
// Built with plain g++ (see Makefile); loaded from Python via ctypes
// (pmpc_tpu/native.py). No external dependencies.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// canonical consensus layout helpers (z = [u_cons; u_free_1..M; x_1..M])
// ---------------------------------------------------------------------------

static inline int64_t u_off(int64_t i, int64_t j, int64_t Nc, int64_t nf,
                            int64_t udim) {
  if (j < Nc) return j * udim;
  return Nc * udim + i * nf + (j - Nc) * udim;
}

static inline int64_t x_off(int64_t i, int64_t j, int64_t M, int64_t Nc,
                            int64_t nf, int64_t N, int64_t xdim,
                            int64_t udim) {
  const int64_t nu_total = Nc * udim + M * nf;
  return nu_total + i * N * xdim + j * xdim;
}

// Builds dense P (n*n), q (n), A (meq*n), b (meq) for the consensus QP.
// Array shapes (row-major):
//   x0 (M,xdim), f (M,N,xdim), fx (M,N,xdim,xdim), fu (M,N,xdim,udim),
//   X_prev (M,N,xdim), U_prev (M,N,udim), Q (M,N,xdim,xdim),
//   R (M,N,udim,udim), X_ref (M,N,xdim), U_ref (M,N,udim),
//   reg_x (M), reg_u (M), slew_reg (M), slew_reg0 (M), slew_um1 (M,udim).
// Returns 0 on success.
int64_t pmpc_build_canonical(
    int64_t M, int64_t N, int64_t xdim, int64_t udim, int64_t Nc,
    const double* x0, const double* f, const double* fx, const double* fu,
    const double* X_prev, const double* U_prev, const double* Qc,
    const double* Rc, const double* X_ref, const double* U_ref,
    const double* reg_x, const double* reg_u, const double* slew_reg,
    const double* slew_reg0, const double* slew_um1, double* P, double* q,
    double* A, double* b) {
  if (Nc < 0) Nc = N;
  const int64_t nf = (N - Nc) * udim;
  const int64_t n = Nc * udim + M * nf + M * N * xdim;
  const int64_t meq = M * N * xdim;
  std::memset(P, 0, sizeof(double) * n * n);
  std::memset(q, 0, sizeof(double) * n);
  std::memset(A, 0, sizeof(double) * meq * n);
  std::memset(b, 0, sizeof(double) * meq);

  const int64_t xN = N * xdim, uN = N * udim;
  for (int64_t i = 0; i < M; ++i) {
    for (int64_t j = 0; j < N; ++j) {
      const int64_t uo = u_off(i, j, Nc, nf, udim);
      const int64_t xo = x_off(i, j, M, Nc, nf, N, xdim, udim);
      const double* Rij = Rc + ((i * N + j) * udim * udim);
      const double* Qij = Qc + ((i * N + j) * xdim * xdim);
      // control cost block + prox
      for (int64_t r = 0; r < udim; ++r) {
        for (int64_t t = 0; t < udim; ++t)
          P[(uo + r) * n + (uo + t)] += Rij[r * udim + t];
        P[(uo + r) * n + (uo + r)] += reg_u[i];
        double val = -reg_u[i] * U_prev[i * uN + j * udim + r];
        for (int64_t t = 0; t < udim; ++t)
          val -= Rij[r * udim + t] * U_ref[i * uN + j * udim + t];
        q[uo + r] += val;
      }
      // state cost block + prox
      for (int64_t r = 0; r < xdim; ++r) {
        for (int64_t t = 0; t < xdim; ++t)
          P[(xo + r) * n + (xo + t)] += Qij[r * xdim + t];
        P[(xo + r) * n + (xo + r)] += reg_x[i];
        double val = -reg_x[i] * X_prev[i * xN + j * xdim + r];
        for (int64_t t = 0; t < xdim; ++t)
          val -= Qij[r * xdim + t] * X_ref[i * xN + j * xdim + t];
        q[xo + r] += val;
      }
    }
    // slew coupling
    for (int64_t j = 0; j + 1 < N; ++j) {
      const int64_t a_ = u_off(i, j, Nc, nf, udim);
      const int64_t b_ = u_off(i, j + 1, Nc, nf, udim);
      for (int64_t r = 0; r < udim; ++r) {
        P[(a_ + r) * n + (a_ + r)] += slew_reg[i];
        P[(b_ + r) * n + (b_ + r)] += slew_reg[i];
        P[(a_ + r) * n + (b_ + r)] -= slew_reg[i];
        P[(b_ + r) * n + (a_ + r)] -= slew_reg[i];
      }
    }
    const int64_t u0 = u_off(i, 0, Nc, nf, udim);
    for (int64_t r = 0; r < udim; ++r) {
      P[(u0 + r) * n + (u0 + r)] += slew_reg0[i];
      q[u0 + r] -= slew_reg0[i] * slew_um1[i * udim + r];
    }
    // dynamics equality rows
    for (int64_t j = 0; j < N; ++j) {
      const int64_t row = (i * N + j) * xdim;
      const int64_t uo = u_off(i, j, Nc, nf, udim);
      const int64_t xo = x_off(i, j, M, Nc, nf, N, xdim, udim);
      const double* fuij = fu + ((i * N + j) * xdim * udim);
      const double* fxij = fx + ((i * N + j) * xdim * xdim);
      for (int64_t r = 0; r < xdim; ++r) {
        for (int64_t t = 0; t < udim; ++t)
          A[(row + r) * n + (uo + t)] = fuij[r * udim + t];
        A[(row + r) * n + (xo + r)] = -1.0;
        double rhs = -f[i * xN + j * xdim + r];
        for (int64_t t = 0; t < udim; ++t)
          rhs += fuij[r * udim + t] * U_prev[i * uN + j * udim + t];
        if (j > 0) {
          const int64_t xo_prev = x_off(i, j - 1, M, Nc, nf, N, xdim, udim);
          for (int64_t t = 0; t < xdim; ++t) {
            A[(row + r) * n + (xo_prev + t)] = fxij[r * xdim + t];
            rhs += fxij[r * xdim + t] * X_prev[i * xN + (j - 1) * xdim + t];
          }
        }
        b[row + r] = rhs;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// dense Cholesky (lower) — factor/solve used by the ADMM iteration
// ---------------------------------------------------------------------------

static bool chol_factor(std::vector<double>& K, int64_t n) {
  for (int64_t j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int64_t k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0) return false;
    d = std::sqrt(d);
    K[j * n + j] = d;
    for (int64_t i = j + 1; i < n; ++i) {
      double v = K[i * n + j];
      for (int64_t k = 0; k < j; ++k) v -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = v / d;
    }
  }
  return true;
}

static void chol_solve(const std::vector<double>& L, int64_t n, double* x) {
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    for (int64_t k = 0; k < i; ++k) v -= L[i * n + k] * x[k];
    x[i] = v / L[i * n + i];
  }
  for (int64_t i = n - 1; i >= 0; --i) {
    double v = x[i];
    for (int64_t k = i + 1; k < n; ++k) v -= L[k * n + i] * x[k];
    x[i] = v / L[i * n + i];
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ADMM box QP:  min 0.5 z'Pz + q'z  s.t.  A z = b,  lo <= z <= hi
// (operator splitting over C = [A; I], eq rows clamped to b)
//
// Persistent solver object with the reference OSQP adapter's incremental and
// proximal-operator API (PMPC.jl/src/osqp_solver.jl:83-207): update_q is
// free, update_P refactors, prox_setup adds diag(mask) to P and snapshots
// (P, q) so repeated prox(bias) calls reuse one factorization; solver state
// (x, duals) persists across solves for warm starting.
// ---------------------------------------------------------------------------

namespace {

struct AdmmSolver {
  int64_t n = 0, meq = 0;
  double rho = 1.0, sigma = 1e-6;
  std::vector<double> P, q, A, b, lo, hi;   // problem data
  std::vector<double> P_snap, q_snap;       // prox snapshots (empty = none)
  std::vector<double> K;                    // Cholesky factor of the KKT
  bool factored = false;
  // persistent iterates (warm start across solves)
  std::vector<double> x, s_eq, s_box, y_eq, y_box;

  bool refactor() {
    K.assign(n * n, 0.0);
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < n; ++j) {
        double v = P[i * n + j];
        if (i == j) v += sigma + rho;
        for (int64_t r = 0; r < meq; ++r)
          v += rho * A[r * n + i] * A[r * n + j];
        K[i * n + j] = v;
      }
    factored = chol_factor(K, n);
    return factored;
  }

  void reset_iterates() {
    x.assign(n, 0.0);
    y_eq.assign(meq, 0.0);
    y_box.assign(n, 0.0);
    s_eq.assign(b.begin(), b.end());
    s_box.assign(n, 0.0);
    for (int64_t i = 0; i < n; ++i)
      s_box[i] = std::fmin(std::fmax(0.0, lo[i]), hi[i]);
  }

  int64_t solve(int64_t max_iter, double eps, double* z_out,
                int64_t* iters_out) {
    if (!factored && !refactor()) return -1;
    std::vector<double> rhs(n);
    int64_t it = 0;
    for (; it < max_iter; ++it) {
      for (int64_t i = 0; i < n; ++i) {
        double v = sigma * x[i] - q[i] + rho * s_box[i] - y_box[i];
        for (int64_t r = 0; r < meq; ++r)
          v += A[r * n + i] * (rho * s_eq[r] - y_eq[r]);
        rhs[i] = v;
      }
      chol_solve(K, n, rhs.data());
      for (int64_t i = 0; i < n; ++i) x[i] = rhs[i];
      double rp = 0.0, ax;
      for (int64_t r = 0; r < meq; ++r) {
        ax = 0.0;
        for (int64_t i = 0; i < n; ++i) ax += A[r * n + i] * x[i];
        s_eq[r] = b[r];  // projection of eq rows is b
        y_eq[r] += rho * (ax - b[r]);
        rp = std::fmax(rp, std::fabs(ax - b[r]));
      }
      for (int64_t i = 0; i < n; ++i) {
        double v = x[i] + y_box[i] / rho;
        double pz = std::fmin(std::fmax(v, lo[i]), hi[i]);
        y_box[i] += rho * (x[i] - pz);
        rp = std::fmax(rp, std::fabs(x[i] - pz));
        s_box[i] = pz;
      }
      if (rp < eps && it > 3) break;
    }
    for (int64_t i = 0; i < n; ++i) z_out[i] = s_box[i];
    // states are not box-projected when unbounded: prefer x for those entries
    for (int64_t i = 0; i < n; ++i)
      if (!(lo[i] > -1e19 || hi[i] < 1e19)) z_out[i] = x[i];
    *iters_out = it;
    return (it < max_iter) ? 0 : 1;
  }
};

std::vector<AdmmSolver*>& registry() {
  static std::vector<AdmmSolver*> reg;
  return reg;
}

}  // namespace

extern "C" {

int64_t pmpc_admm_create(int64_t n, int64_t meq, const double* P,
                         const double* q, const double* A, const double* b,
                         const double* lo, const double* hi, double rho,
                         double sigma) {
  AdmmSolver* s = new AdmmSolver();
  s->n = n;
  s->meq = meq;
  s->rho = rho;
  s->sigma = sigma;
  s->P.assign(P, P + n * n);
  s->q.assign(q, q + n);
  s->A.assign(A, A + meq * n);
  s->b.assign(b, b + meq);
  s->lo.assign(lo, lo + n);
  s->hi.assign(hi, hi + n);
  s->reset_iterates();
  if (!s->refactor()) {
    delete s;
    return -1;
  }
  registry().push_back(s);
  return static_cast<int64_t>(registry().size()) - 1;
}

static AdmmSolver* get(int64_t h) {
  auto& reg = registry();
  if (h < 0 || h >= static_cast<int64_t>(reg.size())) return nullptr;
  return reg[h];
}

int64_t pmpc_admm_destroy(int64_t h) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  delete s;
  registry()[h] = nullptr;
  return 0;
}

// incremental updates (set_q! is free; set_P!/set_A!/set_bounds! refactor as
// needed — parity with osqp_solver.jl:83-168)
int64_t pmpc_admm_set_q(int64_t h, const double* q) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  s->q.assign(q, q + s->n);
  return 0;
}

int64_t pmpc_admm_set_P(int64_t h, const double* P) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  s->P.assign(P, P + s->n * s->n);
  return s->refactor() ? 0 : -2;
}

int64_t pmpc_admm_set_bounds(int64_t h, const double* lo, const double* hi) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  s->lo.assign(lo, lo + s->n);
  s->hi.assign(hi, hi + s->n);
  return 0;
}

int64_t pmpc_admm_set_b(int64_t h, const double* b) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  s->b.assign(b, b + s->meq);
  return 0;
}

// proximal-operator API (osqp_solver.jl:173-207): after prox_setup(mask),
// prox(bias) solves  min f0(z) + 0.5 z'diag(mask)z + bias'z  reusing ONE
// factorization — i.e. with bias = -mask .* v it evaluates
// prox_{f0, mask}(v) = argmin f0(z) + 0.5 ||z - v||^2_diag(mask).
int64_t pmpc_admm_prox_setup(int64_t h, const double* mask) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  // a second prox_setup without prox_reset must not stack masks: restore the
  // un-masked (P, q) from the existing snapshot before applying the new mask
  if (!s->P_snap.empty()) {
    s->P = s->P_snap;
    s->q = s->q_snap;
  }
  s->P_snap = s->P;
  s->q_snap = s->q;
  for (int64_t i = 0; i < s->n; ++i) s->P[i * s->n + i] += mask[i];
  return s->refactor() ? 0 : -2;
}

int64_t pmpc_admm_prox(int64_t h, const double* bias, int64_t max_iter,
                       double eps, double* z_out, int64_t* iters_out) {
  AdmmSolver* s = get(h);
  if (!s || s->q_snap.empty()) return -1;
  for (int64_t i = 0; i < s->n; ++i) s->q[i] = s->q_snap[i] + bias[i];
  return s->solve(max_iter, eps, z_out, iters_out);
}

int64_t pmpc_admm_prox_reset(int64_t h) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  if (s->P_snap.empty()) return 0;
  s->P = s->P_snap;
  s->q = s->q_snap;
  s->P_snap.clear();
  s->q_snap.clear();
  return s->refactor() ? 0 : -2;
}

int64_t pmpc_admm_solve(int64_t h, int64_t max_iter, double eps,
                        double* z_out, int64_t* iters_out) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  return s->solve(max_iter, eps, z_out, iters_out);
}

int64_t pmpc_admm_cold_start(int64_t h) {
  AdmmSolver* s = get(h);
  if (!s) return -1;
  s->reset_iterates();
  return 0;
}

// one-shot convenience wrapper (previous API, kept for compatibility)
int64_t pmpc_admm_box_qp(int64_t n, int64_t meq, const double* P,
                         const double* q, const double* A, const double* b,
                         const double* lo, const double* hi, double rho,
                         double sigma, int64_t max_iter, double eps,
                         double* z_out, int64_t* iters_out) {
  AdmmSolver s;
  s.n = n;
  s.meq = meq;
  s.rho = rho;
  s.sigma = sigma;
  s.P.assign(P, P + n * n);
  s.q.assign(q, q + n);
  s.A.assign(A, A + meq * n);
  s.b.assign(b, b + meq);
  s.lo.assign(lo, lo + n);
  s.hi.assign(hi, hi + n);
  s.reset_iterates();
  if (!s.refactor()) return -1;
  return s.solve(max_iter, eps, z_out, iters_out);
}

}  // extern "C"
