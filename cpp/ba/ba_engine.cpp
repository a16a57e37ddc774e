// Native bundle-adjustment engine: Levenberg-Marquardt with an explicit
// Schur-complement reduced camera system.
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
// Exposed as a plain C ABI for ctypes (self_supervise_sfm_tpu/native/ba.py).
// No external dependencies.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 { double x, y, z; };

inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
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

struct Problem {
  int C, P, O;
  double* cam;           // (C, 6) aa + t (in/out)
  const double* K;       // (C, 4) fx fy cx cy
  double* pts;           // (P, 3) (in/out)
  const int32_t* cam_idx;
  const int32_t* pt_idx;
  const double* uv;      // (O, 2)
  const double* w;       // (O,)
};

// residual + jacobians for one observation.
// camera update is LOCAL: R <- exp(dw) R, t <- t + dt, so
//   pc = R X + t,  d pc/d dw = -[pc - t]_x,  d pc/d dt = I,  d pc/d X = R.
void obs_jacobian(const Problem& pb, int o, const double* Rcache,
                  double r[2], double Jc[2][6], double Jp[2][3],
                  bool want_jac) {
  int c = pb.cam_idx[o], p = pb.pt_idx[o];
  const double* R = Rcache + 9 * c;
  const double* t = pb.cam + 6 * c + 3;
  const double* X = pb.pts + 3 * p;
  const double* Kc = pb.K + 4 * c;
  double wgt = pb.w[o];

  double pc[3];
  for (int i = 0; i < 3; i++)
    pc[i] = R[i * 3 + 0] * X[0] + R[i * 3 + 1] * X[1] + R[i * 3 + 2] * X[2] + t[i];
  double z = pc[2] > 1e-6 ? pc[2] : 1e-6;
  double invz = 1.0 / z;
  double u = Kc[0] * pc[0] * invz + Kc[2];
  double v = Kc[1] * pc[1] * invz + Kc[3];
  r[0] = (u - pb.uv[2 * o + 0]) * wgt;
  r[1] = (v - pb.uv[2 * o + 1]) * wgt;
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

double total_cost(const Problem& pb, const double* Rcache, double huber) {
  double cost = 0;
  double Jc[2][6], Jp[2][3];  // unused (want_jac = false)
  for (int o = 0; o < pb.O; o++) {
    double r[2];
    obs_jacobian(pb, o, Rcache, r, Jc, Jp, false);
    double r2 = r[0] * r[0] + r[1] * r[1];
    if (huber > 0) {
      double rn = std::sqrt(r2);
      cost += rn <= huber ? 0.5 * r2 : huber * (rn - 0.5 * huber);
    } else {
      cost += 0.5 * r2;
    }
  }
  return cost;
}

void build_R_cache(const Problem& pb, std::vector<double>& Rcache) {
  Rcache.resize(9 * pb.C);
  for (int c = 0; c < pb.C; c++) aa_to_R(pb.cam + 6 * c, Rcache.data() + 9 * c);
}

}  // namespace

extern "C" {

// Returns 0 on success. cam_params (C,6), points (P,3) updated in place.
int ba_solve(int num_cams, int num_pts, int num_obs,
             double* cam_params, const double* intrinsics4, double* points,
             const int32_t* cam_idx, const int32_t* pt_idx,
             const double* uv, const double* weight,
             int max_iters, double init_lambda, double huber_delta,
             double* final_cost, int* iters_run) {
  Problem pb{num_cams, num_pts, num_obs, cam_params, intrinsics4, points,
             cam_idx, pt_idx, uv, weight};
  const int C = num_cams, P = num_pts, O = num_obs;
  const int n = 6 * C;

  // observation lists per point for Schur assembly
  std::vector<int> pt_count(P, 0);
  for (int o = 0; o < O; o++) pt_count[pt_idx[o]]++;
  std::vector<int> pt_start(P + 1, 0);
  for (int p = 0; p < P; p++) pt_start[p + 1] = pt_start[p] + pt_count[p];
  std::vector<int> pt_obs(O);
  {
    std::vector<int> cur(pt_start.begin(), pt_start.end() - 1);
    for (int o = 0; o < O; o++) pt_obs[cur[pt_idx[o]]++] = o;
  }

  std::vector<double> Rcache;
  build_R_cache(pb, Rcache);

  double lambda = init_lambda;
  double cost = total_cost(pb, Rcache.data(), huber_delta);

  std::vector<double> Jc_all(O * 12), Jp_all(O * 6), r_all(O * 2);
  std::vector<double> U(C * 36), bc(C * 6), Vp(P * 9), bp(P * 3);
  std::vector<double> S(n * n), rhs(n);
  std::vector<double> cam_bak(C * 6), pts_bak(P * 3);

  int it = 0;
  for (; it < max_iters; it++) {
    // --- linearize ---
    std::fill(U.begin(), U.end(), 0.0);
    std::fill(bc.begin(), bc.end(), 0.0);
    std::fill(Vp.begin(), Vp.end(), 0.0);
    std::fill(bp.begin(), bp.end(), 0.0);
    for (int o = 0; o < O; o++) {
      double r[2], Jc[2][6], Jp[2][3];
      obs_jacobian(pb, o, Rcache.data(), r, Jc, Jp, true);
      // Huber IRLS scaling
      if (huber_delta > 0) {
        double rn = std::sqrt(r[0] * r[0] + r[1] * r[1] + 1e-12);
        double s = rn <= huber_delta ? 1.0 : std::sqrt(huber_delta / rn);
        r[0] *= s; r[1] *= s;
        for (int i = 0; i < 2; i++) {
          for (int j = 0; j < 6; j++) Jc[i][j] *= s;
          for (int j = 0; j < 3; j++) Jp[i][j] *= s;
        }
      }
      std::memcpy(&Jc_all[o * 12], Jc, sizeof(Jc));
      std::memcpy(&Jp_all[o * 6], Jp, sizeof(Jp));
      r_all[o * 2] = r[0]; r_all[o * 2 + 1] = r[1];
      int c = cam_idx[o], p = pt_idx[o];
      for (int i = 0; i < 6; i++) {
        for (int j = 0; j < 6; j++)
          U[c * 36 + i * 6 + j] += Jc[0][i] * Jc[0][j] + Jc[1][i] * Jc[1][j];
        bc[c * 6 + i] += Jc[0][i] * r[0] + Jc[1][i] * r[1];
      }
      for (int i = 0; i < 3; i++) {
        for (int j = 0; j < 3; j++)
          Vp[p * 9 + i * 3 + j] += Jp[0][i] * Jp[0][j] + Jp[1][i] * Jp[1][j];
        bp[p * 3 + i] += Jp[0][i] * r[0] + Jp[1][i] * r[1];
      }
    }

    // --- assemble damped Schur system ---
    std::fill(S.begin(), S.end(), 0.0);
    std::fill(rhs.begin(), rhs.end(), 0.0);
    for (int c = 0; c < C; c++) {
      for (int i = 0; i < 6; i++) {
        for (int j = 0; j < 6; j++)
          S[(c * 6 + i) * n + c * 6 + j] = U[c * 36 + i * 6 + j];
        S[(c * 6 + i) * n + c * 6 + i] += lambda;
        rhs[c * 6 + i] = -bc[c * 6 + i];
      }
    }
    std::vector<double> Vinv(P * 9);
    for (int p = 0; p < P; p++) {
      double Vl[9];
      std::memcpy(Vl, &Vp[p * 9], sizeof(Vl));
      for (int i = 0; i < 3; i++) Vl[i * 3 + i] += lambda + 1e-12;
      if (!inv3(Vl, &Vinv[p * 9])) {
        std::memset(&Vinv[p * 9], 0, 9 * sizeof(double));
      }
    }
    // per point: W_i = sum_{obs of (c_i, p)} Jc^T Jp   (2x6)^T (2x3) = 6x3
    std::vector<double> Wblk;  // per obs 6x3
    for (int p = 0; p < P; p++) {
      int k0 = pt_start[p], k1 = pt_start[p + 1];
      int kp = k1 - k0;
      if (kp == 0) continue;
      Wblk.assign(kp * 18, 0.0);
      double Vb[3];  // V^-1 bp
      const double* Vi = &Vinv[p * 9];
      const double* bpp = &bp[p * 3];
      for (int i = 0; i < 3; i++)
        Vb[i] = Vi[i * 3] * bpp[0] + Vi[i * 3 + 1] * bpp[1] + Vi[i * 3 + 2] * bpp[2];
      for (int k = 0; k < kp; k++) {
        int o = pt_obs[k0 + k];
        const double* Jc = &Jc_all[o * 12];
        const double* Jp = &Jp_all[o * 6];
        double* Wk = &Wblk[k * 18];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++)
            Wk[i * 3 + j] = Jc[0 * 6 + i] * Jp[0 * 3 + j] + Jc[1 * 6 + i] * Jp[1 * 3 + j];
        // rhs += W V^-1 bp
        int c = cam_idx[o];
        for (int i = 0; i < 6; i++) {
          double s = 0;
          for (int j = 0; j < 3; j++) s += Wk[i * 3 + j] * Vb[j];
          rhs[c * 6 + i] += s;
        }
      }
      // S -= W_a V^-1 W_b^T for all (a, b) pairs of this point
      for (int a = 0; a < kp; a++) {
        int ca = cam_idx[pt_obs[k0 + a]];
        const double* Wa = &Wblk[a * 18];
        double WaVi[18];  // 6x3
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 3; j++) {
            double s = 0;
            for (int k = 0; k < 3; k++) s += Wa[i * 3 + k] * Vi[k * 3 + j];
            WaVi[i * 3 + j] = s;
          }
        for (int b = 0; b < kp; b++) {
          int cb = cam_idx[pt_obs[k0 + b]];
          const double* Wb = &Wblk[b * 18];
          for (int i = 0; i < 6; i++)
            for (int j = 0; j < 6; j++) {
              double s = 0;
              for (int k = 0; k < 3; k++) s += WaVi[i * 3 + k] * Wb[j * 3 + k];
              S[(ca * 6 + i) * n + cb * 6 + j] -= s;
            }
        }
      }
    }

    // --- solve + apply ---
    std::vector<double> Ssolve(S), dc(rhs);
    if (!chol_solve(Ssolve, dc, n)) {
      lambda *= 10.0;
      continue;
    }
    std::memcpy(cam_bak.data(), cam_params, C * 6 * sizeof(double));
    std::memcpy(pts_bak.data(), points, P * 3 * sizeof(double));
    // cameras: R <- exp(dw) R, t += dt
    for (int c = 0; c < C; c++) {
      double dR[9], Rold[9], Rnew[9];
      aa_to_R(&dc[c * 6], dR);
      std::memcpy(Rold, &Rcache[9 * c], sizeof(Rold));
      matmul3(dR, Rold, Rnew);
      R_to_aa(Rnew, cam_params + 6 * c);
      for (int i = 0; i < 3; i++) cam_params[6 * c + 3 + i] += dc[c * 6 + 3 + i];
    }
    // points: dp = V^-1 (-bp - W^T dc)
    for (int p = 0; p < P; p++) {
      double acc[3] = {-bp[p * 3], -bp[p * 3 + 1], -bp[p * 3 + 2]};
      for (int k = pt_start[p]; k < pt_start[p + 1]; k++) {
        int o = pt_obs[k];
        int c = cam_idx[o];
        const double* Jc = &Jc_all[o * 12];
        const double* Jp = &Jp_all[o * 6];
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
      const double* Vi = &Vinv[p * 9];
      for (int i = 0; i < 3; i++)
        points[p * 3 + i] += Vi[i * 3] * acc[0] + Vi[i * 3 + 1] * acc[1] + Vi[i * 3 + 2] * acc[2];
    }

    build_R_cache(pb, Rcache);
    double new_cost = total_cost(pb, Rcache.data(), huber_delta);
    if (new_cost < cost) {
      cost = new_cost;
      lambda = std::fmax(lambda * 0.5, 1e-9);
    } else {
      std::memcpy(cam_params, cam_bak.data(), C * 6 * sizeof(double));
      std::memcpy(points, pts_bak.data(), P * 3 * sizeof(double));
      build_R_cache(pb, Rcache);
      lambda = std::fmin(lambda * 4.0, 1e8);
    }
  }
  *final_cost = cost;
  *iters_run = it;
  return 0;
}

}  // extern "C"
