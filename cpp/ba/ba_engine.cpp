// Native bundle-adjustment engine: Levenberg-Marquardt with an explicit
// Schur-complement reduced camera system, partitionable across hosts.
//
// This is the C++ counterpart of the on-TPU solver in
// self_supervise_sfm_tpu/ops/bundle_adjust.py (the reference delegates BA to
// COLMAP via pycolmap, sailrecon/dependency/np_to_pycolmap.py). It targets
// host-side pipelines and large scenes where an explicit reduced system +
// Cholesky beats matrix-free CG:
//
// - camera parameterisation: axis-angle (global) + translation; LM updates
//   are applied through a local so(3) left-perturbation (standard BA
//   practice: exp(dw) * R), analytically differentiated.
// - per-point 3x3 blocks eliminated in closed form; the reduced 6C x 6C
//   system is assembled per point (O(sum_p k_p^2) block outer products) and
//   solved with a dense Cholesky.
// - Huber IRLS robustness, multiplicative damping with accept/reject.
//
// Distribution model (SURVEY.md §7.1 step 10): observations are partitioned
// by POINT — a point's whole track lives on one worker, so the 3x3 point
// elimination is worker-local and each worker contributes an additive
// partial (S_w, rhs_w, cost_w) to the shared 6C x 6C reduced camera system.
// The engine exposes exactly that phase structure as a C ABI
// (ba_shard_create / ba_shard_linearize / ba_shard_trial_cost /
// ba_shard_accept ...); the *reduction* of the partials and the LM control
// loop live in the caller (self_supervise_sfm_tpu/native/ba.py), which sums
// locally for single-host runs and via jax collectives (psum over the device
// mesh, riding ICI) for multi-host runs. ba_solve() keeps the one-call
// single-host API and is implemented as the 1-shard special case.
//
// Exposed as a plain C ABI for ctypes. No external dependencies.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// OpenMP thread budget. Per-thread Schur accumulators are (6C)^2 doubles, so
// threads are capped to keep the copies within ~512 MB total.
int thread_count(size_t per_thread_bytes) {
#ifdef _OPENMP
  int t = omp_get_max_threads();
  if (t > 16) t = 16;
  while (t > 1 && per_thread_bytes * t > (size_t(1) << 29)) t--;
  return t;
#else
  (void)per_thread_bytes;
  return 1;
#endif
}

// Rodrigues: axis-angle -> 3x3 row-major rotation.
void aa_to_R(const double* aa, double* R) {
  double t2 = aa[0] * aa[0] + aa[1] * aa[1] + aa[2] * aa[2];
  double t = std::sqrt(t2);
  double kx, ky, kz, ct, st;
  if (t < 1e-12) {
    // first-order expansion
    R[0] = 1; R[1] = -aa[2]; R[2] = aa[1];
    R[3] = aa[2]; R[4] = 1; R[5] = -aa[0];
    R[6] = -aa[1]; R[7] = aa[0]; R[8] = 1;
    return;
  }
  kx = aa[0] / t; ky = aa[1] / t; kz = aa[2] / t;
  ct = std::cos(t); st = std::sin(t);
  double vt = 1.0 - ct;
  R[0] = ct + kx * kx * vt;      R[1] = kx * ky * vt - kz * st; R[2] = kx * kz * vt + ky * st;
  R[3] = ky * kx * vt + kz * st; R[4] = ct + ky * ky * vt;      R[5] = ky * kz * vt - kx * st;
  R[6] = kz * kx * vt - ky * st; R[7] = kz * ky * vt + kx * st; R[8] = ct + kz * kz * vt;
}

// rotation (row-major) -> axis-angle
void R_to_aa(const double* R, double* aa) {
  double tr = R[0] + R[4] + R[8];
  double c = std::fmin(1.0, std::fmax(-1.0, (tr - 1.0) / 2.0));
  double theta = std::acos(c);
  double w[3] = {R[7] - R[5], R[2] - R[6], R[3] - R[1]};
  double s = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  if (theta > M_PI - 1e-4) {
    // theta ~ pi: w ~ 0 is uninformative — recover the axis from the
    // symmetric part (R + I)/2 = k k^T at pi, sign from w (matching
    // native/ba.py::_np_mat_to_axis_angle; without this branch a
    // 180-degree pose would round-trip to near-identity and the LM step
    // for that camera would always be rejected)
    double A[9];
    for (int i = 0; i < 9; i++) A[i] = R[i] / 2.0;
    A[0] += 0.5; A[4] += 0.5; A[8] += 0.5;
    double dgs[3] = {std::sqrt(std::fmax(A[0], 0.0)),
                     std::sqrt(std::fmax(A[4], 0.0)),
                     std::sqrt(std::fmax(A[8], 0.0))};
    int k = 0;
    if (dgs[1] > dgs[k]) k = 1;
    if (dgs[2] > dgs[k]) k = 2;
    double ax[3] = {0.0, 0.0, 1.0};
    if (dgs[k] > 0) {
      ax[0] = A[0 * 3 + k] / dgs[k];
      ax[1] = A[1 * 3 + k] / dgs[k];
      ax[2] = A[2 * 3 + k] / dgs[k];
      double n = std::sqrt(ax[0] * ax[0] + ax[1] * ax[1] + ax[2] * ax[2]);
      if (n > 0) { ax[0] /= n; ax[1] /= n; ax[2] /= n; }
    }
    double sgn = w[0] * ax[0] + w[1] * ax[1] + w[2] * ax[2];
    sgn = sgn < 0 ? -1.0 : 1.0;
    aa[0] = sgn * ax[0] * theta;
    aa[1] = sgn * ax[1] * theta;
    aa[2] = sgn * ax[2] * theta;
    return;
  }
  if (s < 1e-12 || theta < 1e-12) {
    aa[0] = 0.5 * w[0]; aa[1] = 0.5 * w[1]; aa[2] = 0.5 * w[2];
    return;
  }
  double k = theta / s;
  aa[0] = k * w[0]; aa[1] = k * w[1]; aa[2] = k * w[2];
}

void matmul3(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += A[i * 3 + k] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

bool inv3(const double* A, double* out) {
  double a = A[0], b = A[1], c = A[2], d = A[3], e = A[4], f = A[5],
         g = A[6], h = A[7], i = A[8];
  double det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  if (std::fabs(det) < 1e-18) return false;
  double inv = 1.0 / det;
  out[0] = (e * i - f * h) * inv; out[1] = (c * h - b * i) * inv; out[2] = (b * f - c * e) * inv;
  out[3] = (f * g - d * i) * inv; out[4] = (a * i - c * g) * inv; out[5] = (c * d - a * f) * inv;
  out[6] = (d * h - e * g) * inv; out[7] = (b * g - a * h) * inv; out[8] = (a * e - b * d) * inv;
  return true;
}

// dense Cholesky solve (in-place on copies), n x n SPD
bool chol_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  for (int i = 0; i < n; i++) {
    for (int j = 0; j <= i; j++) {
      double s = A[i * n + j];
      for (int k = 0; k < j; k++) s -= A[i * n + k] * A[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        A[i * n + i] = std::sqrt(s);
      } else {
        A[i * n + j] = s / A[j * n + j];
      }
    }
  }
  // forward
  for (int i = 0; i < n; i++) {
    double s = b[i];
    for (int k = 0; k < i; k++) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  // backward
  for (int i = n - 1; i >= 0; i--) {
    double s = b[i];
    for (int k = i + 1; k < n; k++) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

// One worker's slice of the problem: all cameras (shared, small), a shard of
// the points and every observation of those points.
struct Shard {
  int C, P, O;
  std::vector<double> K;        // (C, 4) fx fy cx cy
  std::vector<double> pts;      // (P, 3) current
  std::vector<double> pts_trial;  // (P, 3) candidate from last trial
  std::vector<int32_t> cam_idx, pt_idx;
  std::vector<double> uv, w;    // (O, 2), (O,)
  double huber;

  // per-point observation lists
  std::vector<int> pt_start, pt_obs;

  // linearization state consumed by trial() (valid after linearize())
  std::vector<double> Jc_all, Jp_all, r_all;  // (O,12), (O,6), (O,2)
  std::vector<double> Vinv, bp;               // (P,9), (P,3)

  std::vector<double> Rcache;  // (C, 9) for the cams of the last linearize
};

void build_R_cache(const double* cam, int C, std::vector<double>& Rcache) {
  Rcache.resize(9 * C);
  for (int c = 0; c < C; c++) aa_to_R(cam + 6 * c, Rcache.data() + 9 * c);
}

// residual + jacobians for one observation against explicit (cam, pts).
// camera update is LOCAL: R <- exp(dw) R, t <- t + dt, so
//   pc = R X + t,  d pc/d dw = -[pc - t]_x,  d pc/d dt = I,  d pc/d X = R.
void obs_jacobian(const Shard& sh, const double* cam, const double* pts,
                  const double* Rcache, int o,
                  double r[2], double Jc[2][6], double Jp[2][3],
                  bool want_jac) {
  int c = sh.cam_idx[o], p = sh.pt_idx[o];
  const double* R = Rcache + 9 * c;
  const double* t = cam + 6 * c + 3;
  const double* X = pts + 3 * p;
  const double* Kc = sh.K.data() + 4 * c;
  double wgt = sh.w[o];

  double pc[3];
  for (int i = 0; i < 3; i++)
    pc[i] = R[i * 3 + 0] * X[0] + R[i * 3 + 1] * X[1] + R[i * 3 + 2] * X[2] + t[i];
  double z = pc[2] > 1e-6 ? pc[2] : 1e-6;
  double invz = 1.0 / z;
  double u = Kc[0] * pc[0] * invz + Kc[2];
  double v = Kc[1] * pc[1] * invz + Kc[3];
  r[0] = (u - sh.uv[2 * o + 0]) * wgt;
  r[1] = (v - sh.uv[2 * o + 1]) * wgt;
  if (!want_jac) return;

  // d(u,v)/d pc
  double du[3] = {Kc[0] * invz, 0.0, -Kc[0] * pc[0] * invz * invz};
  double dv[3] = {0.0, Kc[1] * invz, -Kc[1] * pc[1] * invz * invz};
  // d pc/d dw = -skew(pc - t) = -skew(R X)
  double rx = pc[0] - t[0], ry = pc[1] - t[1], rz = pc[2] - t[2];
  double dpc_dw[3][3] = {{0, rz, -ry}, {-rz, 0, rx}, {ry, -rx, 0}};
  for (int i = 0; i < 3; i++) {
    Jc[0][i] = wgt * (du[0] * dpc_dw[0][i] + du[1] * dpc_dw[1][i] + du[2] * dpc_dw[2][i]);
    Jc[1][i] = wgt * (dv[0] * dpc_dw[0][i] + dv[1] * dpc_dw[1][i] + dv[2] * dpc_dw[2][i]);
    Jc[0][3 + i] = wgt * du[i];
    Jc[1][3 + i] = wgt * dv[i];
    // d pc/dX = R (column i of R)
    Jp[0][i] = wgt * (du[0] * R[0 * 3 + i] + du[1] * R[1 * 3 + i] + du[2] * R[2 * 3 + i]);
    Jp[1][i] = wgt * (dv[0] * R[0 * 3 + i] + dv[1] * R[1 * 3 + i] + dv[2] * R[2 * 3 + i]);
  }
}

double shard_cost(const Shard& sh, const double* cam, const double* pts) {
  std::vector<double> Rcache;
  build_R_cache(cam, sh.C, Rcache);
  double cost = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : cost) schedule(static) \
    num_threads(thread_count(0))
#endif
  for (int o = 0; o < sh.O; o++) {
    double r[2], Jc[2][6], Jp[2][3];
    obs_jacobian(sh, cam, pts, Rcache.data(), o, r, Jc, Jp, false);
    double r2 = r[0] * r[0] + r[1] * r[1];
    if (sh.huber > 0) {
      double rn = std::sqrt(r2);
      cost += rn <= sh.huber ? 0.5 * r2 : sh.huber * (rn - 0.5 * sh.huber);
    } else {
      cost += 0.5 * r2;
    }
  }
  return cost;
}

// Phase A of a linearization (representation-independent): per-observation
// jacobians/residuals with Huber IRLS, the per-point V blocks, bp, and
// V^-1. Fills sh.{Jc_all, Jp_all, r_all, Vinv, bp}; returns the cost at the
// linearization point. The caller scatters U/W into its chosen reduced-
// system representation (dense 6Cx6C, or block-CSR for the PCG path).
double linearize_point_blocks(Shard& sh, const double* cam, double lambda) {
  const int C = sh.C, P = sh.P, O = sh.O;
  build_R_cache(cam, C, sh.Rcache);

  sh.Jc_all.assign(O * 12, 0.0);
  sh.Jp_all.assign(O * 6, 0.0);
  sh.r_all.assign(O * 2, 0.0);
  sh.Vinv.assign(P * 9, 0.0);
  sh.bp.assign(P * 3, 0.0);
  std::vector<double> Vp(P * 9, 0.0);
  double cost = 0;

  // parallel: per-observation jacobians/residuals + cost — the
  // transcendental-heavy part; writes are disjoint per observation
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : cost) schedule(static) \
    num_threads(thread_count(0))
#endif
  for (int o = 0; o < O; o++) {
    double r[2], Jc[2][6], Jp[2][3];
    obs_jacobian(sh, cam, sh.pts.data(), sh.Rcache.data(), o, r, Jc, Jp, true);
    double r2 = r[0] * r[0] + r[1] * r[1];
    if (sh.huber > 0) {
      double rn = std::sqrt(r2);
      cost += rn <= sh.huber ? 0.5 * r2 : sh.huber * (rn - 0.5 * sh.huber);
      // Huber IRLS scaling
      double s = rn <= sh.huber ? 1.0 : std::sqrt(sh.huber / std::sqrt(r2 + 1e-12));
      if (s != 1.0) {
        r[0] *= s; r[1] *= s;
        for (int i = 0; i < 2; i++) {
          for (int j = 0; j < 6; j++) Jc[i][j] *= s;
          for (int j = 0; j < 3; j++) Jp[i][j] *= s;
        }
      }
    } else {
      cost += 0.5 * r2;
    }
    std::memcpy(&sh.Jc_all[o * 12], Jc, sizeof(Jc));
    std::memcpy(&sh.Jp_all[o * 6], Jp, sizeof(Jp));
    sh.r_all[o * 2] = r[0]; sh.r_all[o * 2 + 1] = r[1];
  }
  // serial, cheap: point-block accumulation
  for (int o = 0; o < O; o++) {
    const double* Jp = &sh.Jp_all[o * 6];
    const double r0 = sh.r_all[o * 2], r1 = sh.r_all[o * 2 + 1];
    int p = sh.pt_idx[o];
    for (int i = 0; i < 3; i++) {
      for (int j = 0; j < 3; j++)
        Vp[p * 9 + i * 3 + j] += Jp[i] * Jp[j] + Jp[3 + i] * Jp[3 + j];
      sh.bp[p * 3 + i] += Jp[i] * r0 + Jp[3 + i] * r1;
    }
  }

  for (int p = 0; p < P; p++) {
    double Vl[9];
    std::memcpy(Vl, &Vp[p * 9], sizeof(Vl));
    for (int i = 0; i < 3; i++) Vl[i * 3 + i] += lambda + 1e-12;
    if (!inv3(Vl, &sh.Vinv[p * 9])) {
      std::memset(&sh.Vinv[p * 9], 0, 9 * sizeof(double));
    }
  }
  return cost;
}

// Linearize at (cam, current pts) and ACCUMULATE this shard's contribution
// into the shared reduced system: S += S_w, rhs += rhs_w. Point damping
// (worker-local) uses `lambda`; the caller adds the camera damping lambda*I
// ONCE to the reduced diagonal after summing shards. Returns the shard cost
// at the linearization point.
double shard_linearize(Shard& sh, const double* cam, double lambda,
                       double* S, double* rhs) {
  const int C = sh.C, P = sh.P, O = sh.O;
  const int n = 6 * C;
  double cost = linearize_point_blocks(sh, cam, lambda);

  // U blocks go straight into the shared S diagonal
  for (int o = 0; o < O; o++) {
    const double* Jc = &sh.Jc_all[o * 12];
    const double r0 = sh.r_all[o * 2], r1 = sh.r_all[o * 2 + 1];
    int c = sh.cam_idx[o];
    for (int i = 0; i < 6; i++) {
      for (int j = 0; j < 6; j++)
        S[(c * 6 + i) * n + c * 6 + j] += Jc[i] * Jc[j] + Jc[6 + i] * Jc[6 + j];
      rhs[c * 6 + i] -= Jc[i] * r0 + Jc[6 + i] * r1;
    }
  }

  // Schur: S -= W_a V^-1 W_b^T, rhs += W V^-1 bp, per point of this shard.
  // Parallel over points with per-thread (S, rhs) accumulators (points
  // sharing cameras would otherwise race); thread count capped so the
  // (6C)^2 copies stay within budget.
  const int nthreads = thread_count(size_t(n) * n * 8 + size_t(n) * 8);
  std::vector<double> S_t, rhs_t;
  if (nthreads > 1) {
    S_t.assign(size_t(nthreads) * n * n, 0.0);
    rhs_t.assign(size_t(nthreads) * n, 0.0);
  }
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads) if (nthreads > 1)
#endif
  {
#ifdef _OPENMP
    const int tid = nthreads > 1 ? omp_get_thread_num() : 0;
#else
    const int tid = 0;
#endif
    double* Sl = nthreads > 1 ? &S_t[size_t(tid) * n * n] : S;
    double* rl = nthreads > 1 ? &rhs_t[size_t(tid) * n] : rhs;
    std::vector<double> Wblk;  // per obs 6x3
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
    for (int p = 0; p < P; p++) {
      int k0 = sh.pt_start[p], k1 = sh.pt_start[p + 1];
      int kp = k1 - k0;
      if (kp == 0) continue;
      Wblk.assign(kp * 18, 0.0);
      const double* Vi = &sh.Vinv[p * 9];
      const double* bpp = &sh.bp[p * 3];
      double Vb[3];  // V^-1 bp
      for (int i = 0; i < 3; i++)
        Vb[i] = Vi[i * 3] * bpp[0] + Vi[i * 3 + 1] * bpp[1] + Vi[i * 3 + 2] * bpp[2];
      for (int k = 0; k < kp; k++) {
        int o = sh.pt_obs[k0 + k];
        const double* Jc = &sh.Jc_all[o * 12];
        const double* Jp = &sh.Jp_all[o * 6];
        double* Wk = &Wblk[k * 18];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++)
            Wk[i * 3 + j] = Jc[0 * 6 + i] * Jp[0 * 3 + j] + Jc[1 * 6 + i] * Jp[1 * 3 + j];
        int c = sh.cam_idx[o];
        for (int i = 0; i < 6; i++) {
          double s = 0;
          for (int j = 0; j < 3; j++) s += Wk[i * 3 + j] * Vb[j];
          rl[c * 6 + i] += s;
        }
      }
      for (int a = 0; a < kp; a++) {
        int ca = sh.cam_idx[sh.pt_obs[k0 + a]];
        const double* Wa = &Wblk[a * 18];
        double WaVi[18];  // 6x3
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++) {
            double s = 0;
            for (int k = 0; k < 3; k++) s += Wa[i * 3 + k] * Vi[k * 3 + j];
            WaVi[i * 3 + j] = s;
          }
        for (int b = 0; b < kp; b++) {
          int cb = sh.cam_idx[sh.pt_obs[k0 + b]];
          const double* Wb = &Wblk[b * 18];
          for (int i = 0; i < 6; i++)
            for (int j = 0; j < 6; j++) {
              double s = 0;
              for (int k = 0; k < 3; k++) s += WaVi[i * 3 + k] * Wb[j * 3 + k];
              Sl[(ca * 6 + i) * n + cb * 6 + j] -= s;
            }
        }
      }
    }
  }
  if (nthreads > 1) {
    for (int t = 0; t < nthreads; t++) {
      const double* Sl = &S_t[size_t(t) * n * n];
      const double* rl = &rhs_t[size_t(t) * n];
      for (size_t i = 0; i < size_t(n) * n; i++) S[i] += Sl[i];
      for (int i = 0; i < n; i++) rhs[i] += rl[i];
    }
  }
  return cost;
}

// ---------------------------------------------------------------------------
// Block-sparse reduced system + preconditioned CG (large-C scenes).
//
// The dense path assembles the full 6C x 6C Schur complement — O(C^2) memory
// and an O(C^3) Cholesky, fine for IMC-scale scenes (tens of cameras) but
// wrong for COLMAP-scale ones (the capability pycolmap gives the reference,
// dependency/np_to_pycolmap.py). At large C the reduced system is sparse:
// block (a, b) is nonzero only if cameras a and b co-observe a point. This
// path stores S as block-CSR of 6x6 blocks over the covisibility pattern and
// solves with CG preconditioned by a block IC(0) incomplete Cholesky
// (block-Jacobi fallback on breakdown) — O(nnz) memory, O(nnz * iters) time.
// ---------------------------------------------------------------------------

struct BlockS {
  int C = 0;
  std::vector<int> row_start;  // C+1
  std::vector<int> col;        // nnz, sorted within each row
  std::vector<double> blk;     // nnz * 36, row-major 6x6 each

  int find(int r, int c) const {
    int lo = row_start[r], hi = row_start[r + 1];
    while (lo < hi) {
      int mid = (lo + hi) / 2;
      if (col[mid] < c) lo = mid + 1; else hi = mid;
    }
    return (lo < row_start[r + 1] && col[lo] == c) ? lo : -1;
  }
};

// Covisibility pattern from the shard's per-point camera lists (both (a,b)
// orders plus every diagonal block).
void build_pattern(const Shard& sh, BlockS& S) {
  const int C = sh.C;
  std::vector<std::vector<int>> rows(C);
  for (int c = 0; c < C; c++) rows[c].push_back(c);
  for (int p = 0; p < sh.P; p++) {
    int k0 = sh.pt_start[p], k1 = sh.pt_start[p + 1];
    for (int a = k0; a < k1; a++)
      for (int b = k0; b < k1; b++) {
        int ca = sh.cam_idx[sh.pt_obs[a]], cb = sh.cam_idx[sh.pt_obs[b]];
        rows[ca].push_back(cb);
      }
  }
  S.C = C;
  S.row_start.assign(C + 1, 0);
  S.col.clear();
  for (int c = 0; c < C; c++) {
    auto& r = rows[c];
    std::sort(r.begin(), r.end());
    r.erase(std::unique(r.begin(), r.end()), r.end());
    S.row_start[c + 1] = S.row_start[c] + (int)r.size();
    S.col.insert(S.col.end(), r.begin(), r.end());
  }
  S.blk.assign(size_t(S.row_start[C]) * 36, 0.0);
}

// Sparse counterpart of shard_linearize: same math, block-CSR accumulation.
double shard_linearize_sparse(Shard& sh, const double* cam, double lambda,
                              BlockS& S, double* rhs) {
  const int P = sh.P, O = sh.O;
  double cost = linearize_point_blocks(sh, cam, lambda);
  std::fill(S.blk.begin(), S.blk.end(), 0.0);

  // U blocks + rhs (serial, disjoint per camera diag block)
  for (int o = 0; o < O; o++) {
    const double* Jc = &sh.Jc_all[o * 12];
    const double r0 = sh.r_all[o * 2], r1 = sh.r_all[o * 2 + 1];
    int c = sh.cam_idx[o];
    double* D = &S.blk[size_t(S.find(c, c)) * 36];
    for (int i = 0; i < 6; i++) {
      for (int j = 0; j < 6; j++)
        D[i * 6 + j] += Jc[i] * Jc[j] + Jc[6 + i] * Jc[6 + j];
      rhs[c * 6 + i] -= Jc[i] * r0 + Jc[6 + i] * r1;
    }
  }

  // Schur: per point, S(ca,cb) -= W_a V^-1 W_b^T; rhs += W V^-1 bp.
  // Parallel over points with per-thread block/rhs accumulators.
  const size_t nnz36 = S.blk.size();
  const int n = 6 * sh.C;
  const int nthreads = thread_count(nnz36 * 8 + size_t(n) * 8);
  std::vector<double> blk_t, rhs_t;
  if (nthreads > 1) {
    blk_t.assign(size_t(nthreads) * nnz36, 0.0);
    rhs_t.assign(size_t(nthreads) * n, 0.0);
  }
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads) if (nthreads > 1)
#endif
  {
#ifdef _OPENMP
    const int tid = nthreads > 1 ? omp_get_thread_num() : 0;
#else
    const int tid = 0;
#endif
    double* Bl = nthreads > 1 ? &blk_t[size_t(tid) * nnz36] : S.blk.data();
    double* rl = nthreads > 1 ? &rhs_t[size_t(tid) * n] : rhs;
    std::vector<double> Wblk;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
    for (int p = 0; p < P; p++) {
      int k0 = sh.pt_start[p], k1 = sh.pt_start[p + 1];
      int kp = k1 - k0;
      if (kp == 0) continue;
      Wblk.assign(kp * 18, 0.0);
      const double* Vi = &sh.Vinv[p * 9];
      const double* bpp = &sh.bp[p * 3];
      double Vb[3];
      for (int i = 0; i < 3; i++)
        Vb[i] = Vi[i * 3] * bpp[0] + Vi[i * 3 + 1] * bpp[1] + Vi[i * 3 + 2] * bpp[2];
      for (int k = 0; k < kp; k++) {
        int o = sh.pt_obs[k0 + k];
        const double* Jc = &sh.Jc_all[o * 12];
        const double* Jp = &sh.Jp_all[o * 6];
        double* Wk = &Wblk[k * 18];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++)
            Wk[i * 3 + j] = Jc[0 * 6 + i] * Jp[0 * 3 + j] + Jc[1 * 6 + i] * Jp[1 * 3 + j];
        int c = sh.cam_idx[o];
        for (int i = 0; i < 6; i++) {
          double s = 0;
          for (int j = 0; j < 3; j++) s += Wk[i * 3 + j] * Vb[j];
          rl[c * 6 + i] += s;
        }
      }
      for (int a = 0; a < kp; a++) {
        int ca = sh.cam_idx[sh.pt_obs[k0 + a]];
        const double* Wa = &Wblk[a * 18];
        double WaVi[18];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++) {
            double s = 0;
            for (int k = 0; k < 3; k++) s += Wa[i * 3 + k] * Vi[k * 3 + j];
            WaVi[i * 3 + j] = s;
          }
        for (int b = 0; b < kp; b++) {
          int cb = sh.cam_idx[sh.pt_obs[k0 + b]];
          double* Bt = Bl + size_t(S.find(ca, cb)) * 36;
          const double* Wb = &Wblk[b * 18];
          for (int i = 0; i < 6; i++)
            for (int j = 0; j < 6; j++) {
              double s = 0;
              for (int k = 0; k < 3; k++) s += WaVi[i * 3 + k] * Wb[j * 3 + k];
              Bt[i * 6 + j] -= s;
            }
        }
      }
    }
  }
  if (nthreads > 1) {
    for (int t = 0; t < nthreads; t++) {
      const double* Bl = &blk_t[size_t(t) * nnz36];
      const double* rl = &rhs_t[size_t(t) * n];
      for (size_t i = 0; i < nnz36; i++) S.blk[i] += Bl[i];
      for (int i = 0; i < n; i++) rhs[i] += rl[i];
    }
  }
  return cost;
}

// 6x6 inverse by Gauss-Jordan with partial pivoting; false if singular.
bool inv6(const double* A, double* out) {
  double M[6][12];
  for (int i = 0; i < 6; i++) {
    for (int j = 0; j < 6; j++) { M[i][j] = A[i * 6 + j]; M[i][6 + j] = i == j; }
  }
  for (int c = 0; c < 6; c++) {
    int piv = c;
    for (int r = c + 1; r < 6; r++)
      if (std::fabs(M[r][c]) > std::fabs(M[piv][c])) piv = r;
    if (std::fabs(M[piv][c]) < 1e-14) return false;
    if (piv != c)
      for (int j = 0; j < 12; j++) std::swap(M[piv][j], M[c][j]);
    double inv = 1.0 / M[c][c];
    for (int j = 0; j < 12; j++) M[c][j] *= inv;
    for (int r = 0; r < 6; r++) {
      if (r == c) continue;
      double f = M[r][c];
      if (f == 0) continue;
      for (int j = 0; j < 12; j++) M[r][j] -= f * M[c][j];
    }
  }
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) out[i * 6 + j] = M[i][6 + j];
  return true;
}

// 6x6 Cholesky A = L L^T (row-major, L lower). False on a non-SPD pivot.
bool chol6(const double* A, double* L) {
  std::memset(L, 0, 36 * sizeof(double));
  for (int i = 0; i < 6; i++) {
    for (int j = 0; j <= i; j++) {
      double s = A[i * 6 + j];
      for (int k = 0; k < j; k++) s -= L[i * 6 + k] * L[j * 6 + k];
      if (i == j) {
        if (s <= 1e-14) return false;
        L[i * 6 + i] = std::sqrt(s);
      } else {
        L[i * 6 + j] = s / L[j * 6 + j];
      }
    }
  }
  return true;
}

// Solve L x = b (L lower 6x6), in place allowed (x may alias b).
inline void lsolve6(const double* L, const double* b, double* x) {
  for (int i = 0; i < 6; i++) {
    double s = b[i];
    for (int k = 0; k < i; k++) s -= L[i * 6 + k] * x[k];
    x[i] = s / L[i * 6 + i];
  }
}

// Solve L^T x = b.
inline void ltsolve6(const double* L, const double* b, double* x) {
  for (int i = 5; i >= 0; i--) {
    double s = b[i];
    for (int k = i + 1; k < 6; k++) s -= L[k * 6 + i] * x[k];
    x[i] = s / L[i * 6 + i];
  }
}

// Block incomplete Cholesky IC(0) of (S + lambda I) on S's lower pattern —
// the Schur system's covisibility graph is near-banded for trajectory
// scenes, so zero-fill-in Cholesky captures most of the coupling that
// block-Jacobi (Ceres's SCHUR_JACOBI) ignores, cutting CG iterations by an
// order of magnitude in the 100-500 camera regime (BA_BENCH.json).
struct BlockIC {
  int C = 0;
  std::vector<int> row_start, col;  // lower triangle incl. diagonal
  std::vector<int> diag;            // entry index of (i, i) per row
  std::vector<double> blk;          // nnz * 36
};

// Does L's cached lower-triangle pattern match S's? Camera count alone is
// not a safe cache key: two Schur systems with the same C but different
// covisibility would silently factor on a stale pattern (advisor r3).
// O(nnz) walk — negligible next to the O(nnz*6^3) factorization.
inline bool ic0_pattern_matches(const BlockS& S, const BlockIC& L) {
  if (L.C != S.C) return false;
  size_t e = 0;
  for (int r = 0; r < S.C; r++) {
    for (int f = S.row_start[r]; f < S.row_start[r + 1]; f++) {
      if (S.col[f] > r) continue;
      if (e >= L.col.size() || L.col[e] != S.col[f]) return false;
      e++;
    }
    if (L.row_start[r + 1] != (int)e) return false;
  }
  return e == L.col.size();
}

// Build the IC(0) factor. Returns false on breakdown (caller falls back to
// block-Jacobi for this solve). The cached pattern in L is reused only when
// it matches S's exactly (see ic0_pattern_matches).
bool ic0_factor(const BlockS& S, double lambda, BlockIC& L) {
  const int C = S.C;
  if (!ic0_pattern_matches(S, L)) {
    L.C = C;
    L.row_start.assign(C + 1, 0);
    L.col.clear();
    L.diag.assign(C, -1);
    for (int r = 0; r < C; r++) {
      for (int e = S.row_start[r]; e < S.row_start[r + 1]; e++)
        if (S.col[e] <= r) {
          if (S.col[e] == r) L.diag[r] = (int)L.col.size();
          L.col.push_back(S.col[e]);
        }
      L.row_start[r + 1] = (int)L.col.size();
    }
    L.blk.assign(size_t(L.col.size()) * 36, 0.0);
  }
  double tmp[36], D[36];
  for (int i = 0; i < C; i++) {
    for (int e = L.row_start[i]; e < L.row_start[i + 1]; e++) {
      int k = L.col[e];
      // B = S_ik  (+ lambda I on the diagonal block)
      const double* Sik = &S.blk[size_t(S.find(i, k)) * 36];
      std::memcpy(tmp, Sik, sizeof(tmp));
      if (k == i)
        for (int d = 0; d < 6; d++) tmp[d * 6 + d] += lambda;
      // B -= sum_j L_ij L_kj^T over the shared leading columns j < k
      int ei = L.row_start[i], ek = L.row_start[k];
      while (ei < e && ek < L.diag[k]) {
        if (L.col[ei] < L.col[ek]) ei++;
        else if (L.col[ei] > L.col[ek]) ek++;
        else {
          const double* A = &L.blk[size_t(ei) * 36];
          const double* B = &L.blk[size_t(ek) * 36];
          for (int r = 0; r < 6; r++)
            for (int c = 0; c < 6; c++) {
              double s = 0;
              for (int t = 0; t < 6; t++) s += A[r * 6 + t] * B[c * 6 + t];
              tmp[r * 6 + c] -= s;
            }
          ei++; ek++;
        }
      }
      double* Le = &L.blk[size_t(e) * 36];
      if (k < i) {
        // L_ik = B * L_kk^-T: solve L_kk y = B_row^T per row
        const double* Lkk = &L.blk[size_t(L.diag[k]) * 36];
        for (int r = 0; r < 6; r++) {
          double b[6], x[6];
          for (int c = 0; c < 6; c++) b[c] = tmp[r * 6 + c];
          lsolve6(Lkk, b, x);
          for (int c = 0; c < 6; c++) Le[r * 6 + c] = x[c];
        }
      } else {
        std::memcpy(D, tmp, sizeof(D));
        if (!chol6(D, Le)) return false;
      }
    }
  }
  return true;
}

// z = (L L^T)^-1 r.
void ic0_apply(const BlockIC& L, const double* r, double* z) {
  const int C = L.C;
  // forward: L y = r
  for (int i = 0; i < C; i++) {
    double acc[6];
    for (int d = 0; d < 6; d++) acc[d] = r[i * 6 + d];
    for (int e = L.row_start[i]; e < L.diag[i]; e++) {
      const double* B = &L.blk[size_t(e) * 36];
      const double* yk = z + L.col[e] * 6;
      for (int a = 0; a < 6; a++)
        for (int b = 0; b < 6; b++) acc[a] -= B[a * 6 + b] * yk[b];
    }
    lsolve6(&L.blk[size_t(L.diag[i]) * 36], acc, z + i * 6);
  }
  // backward: L^T z = y (column-oriented over L's rows)
  for (int i = C - 1; i >= 0; i--) {
    double x[6];
    ltsolve6(&L.blk[size_t(L.diag[i]) * 36], z + i * 6, x);
    for (int d = 0; d < 6; d++) z[i * 6 + d] = x[d];
    for (int e = L.row_start[i]; e < L.diag[i]; e++) {
      const double* B = &L.blk[size_t(e) * 36];
      double* zk = z + L.col[e] * 6;
      for (int a = 0; a < 6; a++)
        for (int b = 0; b < 6; b++) zk[b] -= B[a * 6 + b] * x[a];
    }
  }
}

// y = (S + lambda I) x, parallel over block rows (serial below ~1k cameras:
// the matvec is a few hundred KB and the OpenMP region fork costs more than
// the loop).
void bs_matvec(const BlockS& S, double lambda, const double* x, double* y) {
  const int C = S.C;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) \
    num_threads(C >= 1024 ? thread_count(0) : 1)
#endif
  for (int r = 0; r < C; r++) {
    double acc[6] = {0, 0, 0, 0, 0, 0};
    for (int e = S.row_start[r]; e < S.row_start[r + 1]; e++) {
      const double* B = &S.blk[size_t(e) * 36];
      const double* xc = x + S.col[e] * 6;
      for (int i = 0; i < 6; i++)
        for (int j = 0; j < 6; j++) acc[i] += B[i * 6 + j] * xc[j];
    }
    for (int i = 0; i < 6; i++) y[r * 6 + i] = acc[i] + lambda * x[r * 6 + i];
  }
}

// PCG on (S + lambda I) dx = rhs, preconditioned with block IC(0) (falls
// back to block-Jacobi if the incomplete factorization breaks down).
// Returns 0 on convergence (||r|| <= tol * ||rhs||), 1 on maxit with the
// best iterate left in x (an inexact-Newton step the LM driver can still
// try — discarding it wastes the whole solve), 2 if the system is not SPD
// at this damping and x is unusable.
int pcg_solve(const BlockS& S, const double* rhs, double lambda, double tol,
              int maxit, double* x, int* iters_out, BlockIC* ic_scratch) {
  const int C = S.C, n = 6 * C;
  const bool use_ic0 = ic_scratch && ic0_factor(S, lambda, *ic_scratch);
  std::vector<double> Minv;
  if (!use_ic0) {
    Minv.resize(size_t(C) * 36);
    for (int c = 0; c < C; c++) {
      double D[36];
      int e = S.find(c, c);
      std::memcpy(D, &S.blk[size_t(e) * 36], sizeof(D));
      for (int i = 0; i < 6; i++) D[i * 6 + i] += lambda;
      if (!inv6(D, &Minv[size_t(c) * 36])) {
        // fall back to scalar Jacobi on this block
        std::memset(&Minv[size_t(c) * 36], 0, sizeof(D));
        for (int i = 0; i < 6; i++) {
          double d = D[i * 6 + i];
          Minv[size_t(c) * 36 + i * 6 + i] = d > 1e-14 ? 1.0 / d : 0.0;
        }
      }
    }
  }
  auto apply_M = [&](const double* r, double* z) {
    if (use_ic0) {
      ic0_apply(*ic_scratch, r, z);
      return;
    }
    for (int c = 0; c < C; c++) {
      const double* Mi = &Minv[size_t(c) * 36];
      const double* rc = r + c * 6;
      double* zc = z + c * 6;
      for (int i = 0; i < 6; i++) {
        double s = 0;
        for (int j = 0; j < 6; j++) s += Mi[i * 6 + j] * rc[j];
        zc[i] = s;
      }
    }
  };
  auto dot = [&](const double* a, const double* b) {
    double s = 0;
    for (int i = 0; i < n; i++) s += a[i] * b[i];
    return s;
  };

  std::fill(x, x + n, 0.0);
  std::vector<double> r(rhs, rhs + n), z(n), p(n), Ap(n);
  double rhsn = std::sqrt(dot(rhs, rhs));
  *iters_out = 0;
  if (rhsn == 0) return 0;
  apply_M(r.data(), z.data());
  p = z;
  double rz = dot(r.data(), z.data());
  for (int it = 0; it < maxit; it++) {
    bs_matvec(S, lambda, p.data(), Ap.data());
    double pAp = dot(p.data(), Ap.data());
    if (pAp <= 0) return it == 0 ? 2 : 1;  // not SPD at this damping
    double alpha = rz / pAp;
    for (int i = 0; i < n; i++) { x[i] += alpha * p[i]; r[i] -= alpha * Ap[i]; }
    *iters_out = it + 1;
    if (std::sqrt(dot(r.data(), r.data())) <= tol * rhsn) return 0;
    apply_M(r.data(), z.data());
    double rz2 = dot(r.data(), z.data());
    double beta = rz2 / rz;
    rz = rz2;
    for (int i = 0; i < n; i++) p[i] = z[i] + beta * p[i];
  }
  return 1;
}

// Back-substitute the camera step into this shard's points (into pts_trial)
// and return the shard cost at (cam_new, pts_trial).
double shard_trial(Shard& sh, const double* cam_new, const double* dc) {
  sh.pts_trial = sh.pts;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(thread_count(0))
#endif
  for (int p = 0; p < sh.P; p++) {
    double acc[3] = {-sh.bp[p * 3], -sh.bp[p * 3 + 1], -sh.bp[p * 3 + 2]};
    for (int k = sh.pt_start[p]; k < sh.pt_start[p + 1]; k++) {
      int o = sh.pt_obs[k];
      int c = sh.cam_idx[o];
      const double* Jc = &sh.Jc_all[o * 12];
      const double* Jp = &sh.Jp_all[o * 6];
      double W[18];
      for (int i = 0; i < 6; i++)
        for (int j = 0; j < 3; j++)
          W[i * 3 + j] = Jc[i] * Jp[j] + Jc[6 + i] * Jp[3 + j];
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int i = 0; i < 6; i++) s += W[i * 3 + j] * dc[c * 6 + i];
        acc[j] -= s;
      }
    }
    const double* Vi = &sh.Vinv[p * 9];
    for (int i = 0; i < 3; i++)
      sh.pts_trial[p * 3 + i] +=
          Vi[i * 3] * acc[0] + Vi[i * 3 + 1] * acc[1] + Vi[i * 3 + 2] * acc[2];
  }
  return shard_cost(sh, cam_new, sh.pts_trial.data());
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Sharded (multi-host) API. pt_idx is LOCAL to the shard (0..num_pts-1);
// cam_idx is GLOBAL (all workers share the camera set).
// ---------------------------------------------------------------------------

void* ba_shard_create(int num_cams, int num_pts, int num_obs,
                      const double* intrinsics4, const double* points,
                      const int32_t* cam_idx, const int32_t* pt_idx,
                      const double* uv, const double* weight,
                      double huber_delta) {
  Shard* sh = new Shard();
  sh->C = num_cams; sh->P = num_pts; sh->O = num_obs;
  sh->K.assign(intrinsics4, intrinsics4 + 4 * num_cams);
  sh->pts.assign(points, points + 3 * num_pts);
  sh->cam_idx.assign(cam_idx, cam_idx + num_obs);
  sh->pt_idx.assign(pt_idx, pt_idx + num_obs);
  sh->uv.assign(uv, uv + 2 * num_obs);
  sh->w.assign(weight, weight + num_obs);
  sh->huber = huber_delta;
  // per-point observation lists
  std::vector<int> cnt(num_pts, 0);
  for (int o = 0; o < num_obs; o++) cnt[pt_idx[o]]++;
  sh->pt_start.assign(num_pts + 1, 0);
  for (int p = 0; p < num_pts; p++) sh->pt_start[p + 1] = sh->pt_start[p] + cnt[p];
  sh->pt_obs.resize(num_obs);
  std::vector<int> cur(sh->pt_start.begin(), sh->pt_start.end() - 1);
  for (int o = 0; o < num_obs; o++) sh->pt_obs[cur[pt_idx[o]]++] = o;
  return sh;
}

void ba_shard_destroy(void* h) { delete static_cast<Shard*>(h); }

// Accumulates into caller-zeroed S (6C x 6C) and rhs (6C); returns cost.
double ba_shard_linearize(void* h, const double* cam, double lambda,
                          double* S, double* rhs) {
  return shard_linearize(*static_cast<Shard*>(h), cam, lambda, S, rhs);
}

// Back-substitute dc into trial points; returns shard cost at the trial.
double ba_shard_trial(void* h, const double* cam_new, const double* dc) {
  return shard_trial(*static_cast<Shard*>(h), cam_new, dc);
}

void ba_shard_accept(void* h) {
  Shard* sh = static_cast<Shard*>(h);
  sh->pts = sh->pts_trial;
}

void ba_shard_get_points(void* h, double* out) {
  Shard* sh = static_cast<Shard*>(h);
  std::memcpy(out, sh->pts.data(), sh->pts.size() * sizeof(double));
}

double ba_shard_cost(void* h, const double* cam) {
  Shard* sh = static_cast<Shard*>(h);
  return shard_cost(*sh, cam, sh->pts.data());
}

// Dense SPD solve of the (damped) reduced system: x = (S + lambda I)^-1 rhs.
// Returns 0 on success, 1 if the Cholesky fails (caller raises lambda).
int ba_solve_reduced(const double* S, const double* rhs, int n, double lambda,
                     double* dx) {
  std::vector<double> A(S, S + (size_t)n * n);
  std::vector<double> b(rhs, rhs + n);
  for (int i = 0; i < n; i++) A[i * n + i] += lambda;
  if (!chol_solve(A, b, n)) return 1;
  std::memcpy(dx, b.data(), n * sizeof(double));
  return 0;
}

// Apply a local so(3) step to the cameras: R <- exp(dw) R, t += dt.
void ba_apply_cam_step(const double* cam, const double* dc, int C,
                       double* cam_out) {
  for (int c = 0; c < C; c++) {
    double dR[9], Rold[9], Rnew[9];
    aa_to_R(dc + c * 6, dR);
    aa_to_R(cam + 6 * c, Rold);
    matmul3(dR, Rold, Rnew);
    R_to_aa(Rnew, cam_out + 6 * c);
    for (int i = 0; i < 3; i++)
      cam_out[6 * c + 3 + i] = cam[6 * c + 3 + i] + dc[c * 6 + 3 + i];
  }
}

// ---------------------------------------------------------------------------
// Single-call API (1-shard special case; LM loop in C).
// Returns 0 on success. cam_params (C,6), points (P,3) updated in place.
// ---------------------------------------------------------------------------

int ba_solve(int num_cams, int num_pts, int num_obs,
             double* cam_params, const double* intrinsics4, double* points,
             const int32_t* cam_idx, const int32_t* pt_idx,
             const double* uv, const double* weight,
             int max_iters, double init_lambda, double huber_delta,
             double* final_cost, int* iters_run) {
  void* h = ba_shard_create(num_cams, num_pts, num_obs, intrinsics4, points,
                            cam_idx, pt_idx, uv, weight, huber_delta);
  Shard* sh = static_cast<Shard*>(h);
  const int n = 6 * num_cams;
  std::vector<double> S((size_t)n * n), rhs(n), dc(n), cam_new(6 * num_cams);

  double lambda = init_lambda;
  double cost = ba_shard_cost(h, cam_params);
  int it = 0;
  for (; it < max_iters; it++) {
    std::fill(S.begin(), S.end(), 0.0);
    std::fill(rhs.begin(), rhs.end(), 0.0);
    ba_shard_linearize(h, cam_params, lambda, S.data(), rhs.data());
    if (ba_solve_reduced(S.data(), rhs.data(), n, lambda, dc.data()) != 0) {
      lambda *= 10.0;
      continue;
    }
    ba_apply_cam_step(cam_params, dc.data(), num_cams, cam_new.data());
    double new_cost = ba_shard_trial(h, cam_new.data(), dc.data());
    if (new_cost < cost) {
      double drop = cost - new_cost;
      cost = new_cost;
      lambda = std::fmax(lambda * 0.5, 1e-9);
      std::memcpy(cam_params, cam_new.data(), 6 * num_cams * sizeof(double));
      ba_shard_accept(h);
      // relative function tolerance (same stop as the PCG path)
      if (drop <= 1e-6 * cost) { it++; break; }
    } else {
      lambda = std::fmin(lambda * 4.0, 1e8);
    }
  }
  ba_shard_get_points(h, points);
  *final_cost = cost;
  *iters_run = it;
  ba_shard_destroy(h);
  return 0;
}

// ---------------------------------------------------------------------------
// Large-scene single-call API: block-sparse Schur + IC(0)-preconditioned
// CG with an inexact-Newton forcing tolerance. Same contract as ba_solve; use when num_cams is large (the dense
// reduced system is O(C^2) memory / O(C^3) solve). cg_tol ~ 1e-6,
// cg_maxit ~ 500 are good defaults. Reports total CG iterations.
// ---------------------------------------------------------------------------

int ba_solve_pcg(int num_cams, int num_pts, int num_obs,
                 double* cam_params, const double* intrinsics4, double* points,
                 const int32_t* cam_idx, const int32_t* pt_idx,
                 const double* uv, const double* weight,
                 int max_iters, double init_lambda, double huber_delta,
                 double cg_tol, int cg_maxit,
                 double* final_cost, int* iters_run, int* cg_iters_total,
                 int64_t* nnz_blocks) {
  void* h = ba_shard_create(num_cams, num_pts, num_obs, intrinsics4, points,
                            cam_idx, pt_idx, uv, weight, huber_delta);
  Shard* sh = static_cast<Shard*>(h);
  const int n = 6 * num_cams;
  BlockS S;
  build_pattern(*sh, S);
  if (nnz_blocks) *nnz_blocks = (int64_t)S.col.size();
  std::vector<double> rhs(n), dc(n), cam_new(6 * num_cams);

  double lambda = init_lambda;
  double cost = ba_shard_cost(h, cam_params);
  int it = 0;
  *cg_iters_total = 0;
  BlockIC ic;
  // Inexact-Newton forcing sequence: early LM iterations solve the linear
  // system loosely (the quadratic model is wrong far from the optimum
  // anyway) and the tolerance tightens toward cg_tol with every accepted
  // step — Ceres's eta strategy. Combined with IC(0) this cuts total CG
  // iterations by >10x vs fixed-tolerance block-Jacobi (BA_BENCH.json).
  double forcing = std::fmax(cg_tol, 1e-2);
  for (; it < max_iters; it++) {
    std::fill(rhs.begin(), rhs.end(), 0.0);
    shard_linearize_sparse(*sh, cam_params, lambda, S, rhs.data());
    double gn = 0;
    for (int i = 0; i < n; i++) gn += rhs[i] * rhs[i];
    // converged: the gradient is numerically zero — further solves only
    // burn CG iterations on the gauge-singular low-damping system
    if (std::sqrt(gn) <= 1e-8 * (1.0 + cost)) break;
    int cg_it = 0;
    int rc = pcg_solve(S, rhs.data(), lambda, forcing, cg_maxit, dc.data(),
                       &cg_it, &ic);
    *cg_iters_total += cg_it;
    if (rc == 2) {  // not SPD: no usable step
      lambda *= 10.0;
      continue;
    }
    // rc == 1 (maxit) still left an inexact step in dc — try it
    ba_apply_cam_step(cam_params, dc.data(), num_cams, cam_new.data());
    double new_cost = ba_shard_trial(h, cam_new.data(), dc.data());
    if (new_cost < cost) {
      double drop = cost - new_cost;
      cost = new_cost;
      lambda = std::fmax(lambda * 0.5, 1e-9);
      forcing = std::fmax(cg_tol, forcing * 0.3);
      std::memcpy(cam_params, cam_new.data(), 6 * num_cams * sizeof(double));
      ba_shard_accept(h);
      // relative function tolerance (Ceres's function_tolerance default)
      if (drop <= 1e-6 * cost) { it++; break; }
    } else {
      lambda = std::fmin(lambda * 4.0, 1e8);
    }
  }
  ba_shard_get_points(h, points);
  *final_cost = cost;
  *iters_run = it;
  ba_shard_destroy(h);
  return 0;
}

}  // extern "C"
