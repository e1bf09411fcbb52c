// Articulated-Body Algorithm (Featherstone) — host-side C++ reference
// engine for cross-validating the on-device JAX dynamics
// (dartenv_tpu/dynamics/algorithms.py).
//
// Role in this framework: the slot the reference stack fills with the DART
// C++ dynamics core (dart/dynamics/Skeleton.cpp / BodyNode.cpp †, SURVEY.md
// §2.4) — an independent native implementation of the same published
// algorithm (Featherstone, Rigid Body Dynamics Algorithms), written against
// this project's SkelModel conventions:
//   * spatial vectors are [angular; linear]
//   * joint transform (R, p): pose of child joint frame in parent joint
//     frame; body-relative transform T_rel = T_pj o T_joint o T_cj^-1
//   * motion transform from parent to child frame: E = R_rel^T, r = p_rel
//   * BALL/FREE generalized velocity is the body twist (S constant)
//   * implicit joint spring/damping folded into D and tau (DART implicit
//     scheme ‡): D += dt*d + dt^2*k, tau -= d*dq + k*(q - q0 + dt*dq)
//
// All math is hand-rolled on plain double arrays (problems are tiny).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// ---- small linear algebra -------------------------------------------------

void mat3_mul(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[i * 3 + k] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

void mat3_tmul(const double* A, const double* B, double* C) {  // A^T B
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[k * 3 + i] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

void mat3_vec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = A[i * 3] * x[0] + A[i * 3 + 1] * x[1] + A[i * 3 + 2] * x[2];
}

void mat3_tvec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 3; ++i)
    y[i] = A[i] * x[0] + A[3 + i] * x[1] + A[6 + i] * x[2];
}

void cross3(const double* a, const double* b, double* c) {
  c[0] = a[1] * b[2] - a[2] * b[1];
  c[1] = a[2] * b[0] - a[0] * b[2];
  c[2] = a[0] * b[1] - a[1] * b[0];
}

void so3_exp(const double* w, double* R) {  // Rodrigues
  const double t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  const double t = std::sqrt(t2);
  double a, b;
  if (t2 < 1e-12) {
    a = 1.0 - t2 / 6.0;
    b = 0.5 - t2 / 24.0;
  } else {
    a = std::sin(t) / t;
    b = (1.0 - std::cos(t)) / t2;
  }
  const double K[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double KK[9];
  mat3_mul(K, K, KK);
  for (int i = 0; i < 9; ++i) R[i] = a * K[i] + b * KK[i];
  R[0] += 1.0;
  R[4] += 1.0;
  R[8] += 1.0;
}

void rot_axis_angle(const double* axis, double angle, double* R) {
  double w[3] = {axis[0] * angle, axis[1] * angle, axis[2] * angle};
  so3_exp(w, R);
}

// (Ra,pa) o (Rb,pb)
void t_compose(const double* Ra, const double* pa, const double* Rb,
               const double* pb, double* R, double* p) {
  mat3_mul(Ra, Rb, R);
  double t[3];
  mat3_vec(Ra, pb, t);
  for (int i = 0; i < 3; ++i) p[i] = pa[i] + t[i];
}

// X v = [E w; E (vl - r x w)]
void xmotion_apply(const double* E, const double* r, const double* v,
                   double* out) {
  double rxw[3], tmp[3];
  cross3(r, v, rxw);
  mat3_vec(E, v, out);
  for (int i = 0; i < 3; ++i) tmp[i] = v[3 + i] - rxw[i];
  mat3_vec(E, tmp, out + 3);
}

// v x m (motion cross)
void crm(const double* v, const double* m, double* out) {
  double a[3], b[3];
  cross3(v, m, a);          // w x mw
  cross3(v, m + 3, b);      // w x ml
  double c[3];
  cross3(v + 3, m, c);      // vl x mw
  for (int i = 0; i < 3; ++i) {
    out[i] = a[i];
    out[3 + i] = b[i] + c[i];
  }
}

// v x* f (force cross)
void crf(const double* v, const double* f, double* out) {
  double a[3], b[3], c[3];
  cross3(v, f, a);          // w x n
  cross3(v + 3, f + 3, b);  // vl x fl
  cross3(v, f + 3, c);      // w x fl
  for (int i = 0; i < 3; ++i) {
    out[i] = a[i] + b[i];
    out[3 + i] = c[i];
  }
}

// dense 6x6 motion transform [[E,0],[-E r^, E]]
void xmotion_mat(const double* E, const double* r, double* X) {
  const double rs[9] = {0, -r[2], r[1], r[2], 0, -r[0], -r[1], r[0], 0};
  double Ers[9];
  mat3_mul(E, rs, Ers);
  std::memset(X, 0, sizeof(double) * 36);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      X[i * 6 + j] = E[i * 3 + j];
      X[(i + 3) * 6 + j] = -Ers[i * 3 + j];
      X[(i + 3) * 6 + (j + 3)] = E[i * 3 + j];
    }
}

// spatial inertia about body origin from (m, com, I_com)
void spatial_inertia(double m, const double* c, const double* Ic, double* I) {
  const double cs[9] = {0, -c[2], c[1], c[2], 0, -c[0], -c[1], c[0], 0};
  double cct[9];
  // cs * cs^T
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += cs[i * 3 + k] * cs[j * 3 + k];
      cct[i * 3 + j] = s;
    }
  std::memset(I, 0, sizeof(double) * 36);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      I[i * 6 + j] = Ic[i * 3 + j] + m * cct[i * 3 + j];
      I[i * 6 + (j + 3)] = m * cs[i * 3 + j];
      I[(i + 3) * 6 + j] = m * cs[j * 3 + i];  // (m c^)^T
    }
  I[3 * 6 + 3] = I[4 * 6 + 4] = I[5 * 6 + 5] = m;
}

void mat6_vec(const double* A, const double* x, double* y) {
  for (int i = 0; i < 6; ++i) {
    double s = 0;
    for (int j = 0; j < 6; ++j) s += A[i * 6 + j] * x[j];
    y[i] = s;
  }
}

// general small dense solve (Gaussian elimination w/ partial pivoting)
bool solve_dense(int n, std::vector<double> A, double* b) {
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int r = col + 1; r < n; ++r)
      if (std::abs(A[r * n + col]) > std::abs(A[piv * n + col])) piv = r;
    if (std::abs(A[piv * n + col]) < 1e-300) return false;
    if (piv != col) {
      for (int c = 0; c < n; ++c) std::swap(A[col * n + c], A[piv * n + c]);
      std::swap(b[col], b[piv]);
    }
    const double d = A[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      const double f = A[r * n + col] / d;
      for (int c = col; c < n; ++c) A[r * n + c] -= f * A[col * n + c];
      b[r] -= f * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (int c = r + 1; c < n; ++c) s -= A[r * n + c] * b[c];
    b[r] = s / A[r * n + r];
  }
  return true;
}

// ---- joint table ------------------------------------------------------
// Must agree with dartenv_tpu/model/skel_model.py enums.
enum JointType {
  kWeld = 0, kRevolute = 1, kPrismatic = 2, kUniversal = 3, kEuler = 4,
  kBall = 5, kTranslational = 6, kPlanar = 7, kFree = 8, kScrew = 9,
};

constexpr int kMaxDof = 6;

// (R, p) of child joint frame in parent joint frame; S, Sdot (6 x nd,
// column-major as nd columns of 6) in the joint frame.
void joint_kin(int jtype, const double* axes, const double* qj,
               const double* dqj, double* R, double* p, double* S,
               double* Sdot, int nd) {
  std::memset(S, 0, sizeof(double) * 6 * kMaxDof);
  std::memset(Sdot, 0, sizeof(double) * 6 * kMaxDof);
  std::memset(p, 0, sizeof(double) * 3);
  const double* a1 = axes;
  const double* a2 = axes + 3;
  const double* a3 = axes + 6;
  auto setcol = [&](int c, const double* w, const double* v) {
    for (int i = 0; i < 3; ++i) {
      S[i * kMaxDof + c] = w ? w[i] : 0.0;
      S[(i + 3) * kMaxDof + c] = v ? v[i] : 0.0;
    }
  };
  auto setcol_dot = [&](int c, const double* w, const double* v) {
    for (int i = 0; i < 3; ++i) {
      Sdot[i * kMaxDof + c] = w ? w[i] : 0.0;
      Sdot[(i + 3) * kMaxDof + c] = v ? v[i] : 0.0;
    }
  };
  switch (jtype) {
    case kWeld: {
      std::memset(R, 0, 9 * sizeof(double));
      R[0] = R[4] = R[8] = 1;
      break;
    }
    case kRevolute: {
      rot_axis_angle(a1, qj[0], R);
      setcol(0, a1, nullptr);
      break;
    }
    case kPrismatic: {
      std::memset(R, 0, 9 * sizeof(double));
      R[0] = R[4] = R[8] = 1;
      for (int i = 0; i < 3; ++i) p[i] = a1[i] * qj[0];
      setcol(0, nullptr, a1);
      break;
    }
    case kScrew: {
      rot_axis_angle(a1, qj[0], R);
      for (int i = 0; i < 3; ++i) p[i] = a2[i] * qj[0];
      setcol(0, a1, a2);  // axes[1] = pitch/(2pi) * axes[0] by convention
      break;
    }
    case kUniversal: {
      double R1[9], R2[9];
      rot_axis_angle(a1, qj[0], R1);
      rot_axis_angle(a2, qj[1], R2);
      mat3_mul(R1, R2, R);
      double s1w[3];
      mat3_tvec(R2, a1, s1w);  // R2^T a1
      setcol(0, s1w, nullptr);
      setcol(1, a2, nullptr);
      // d/dt (R2^T a1) = -dq2 * a2 x (R2^T a1)
      double d1[3];
      cross3(a2, s1w, d1);
      for (int i = 0; i < 3; ++i) d1[i] *= -dqj[1];
      setcol_dot(0, d1, nullptr);
      break;
    }
    case kEuler: {
      double R1[9], R2[9], R3[9], R12[9];
      rot_axis_angle(a1, qj[0], R1);
      rot_axis_angle(a2, qj[1], R2);
      rot_axis_angle(a3, qj[2], R3);
      mat3_mul(R1, R2, R12);
      mat3_mul(R12, R3, R);
      double t1[3], s1[3], s2[3];
      mat3_tvec(R2, a1, t1);   // R2^T e1
      mat3_tvec(R3, t1, s1);   // R3^T R2^T e1
      mat3_tvec(R3, a2, s2);   // R3^T e2
      setcol(0, s1, nullptr);
      setcol(1, s2, nullptr);
      setcol(2, a3, nullptr);
      // d(R3^T x)/dt = -dq3 e3 x (R3^T x) + R3^T xdot
      double dt1[3];  // d/dt (R2^T e1) = -dq2 a2 x t1
      cross3(a2, t1, dt1);
      for (int i = 0; i < 3; ++i) dt1[i] *= -dqj[1];
      double ds1a[3], ds1b[3], ds1[3];
      cross3(a3, s1, ds1a);
      mat3_tvec(R3, dt1, ds1b);
      for (int i = 0; i < 3; ++i) ds1[i] = -dqj[2] * ds1a[i] + ds1b[i];
      double ds2[3];
      cross3(a3, s2, ds2);
      for (int i = 0; i < 3; ++i) ds2[i] *= -dqj[2];
      setcol_dot(0, ds1, nullptr);
      setcol_dot(1, ds2, nullptr);
      break;
    }
    case kBall: {
      so3_exp(qj, R);
      const double ex[3] = {1, 0, 0}, ey[3] = {0, 1, 0}, ez[3] = {0, 0, 1};
      setcol(0, ex, nullptr);
      setcol(1, ey, nullptr);
      setcol(2, ez, nullptr);
      break;
    }
    case kTranslational: {
      std::memset(R, 0, 9 * sizeof(double));
      R[0] = R[4] = R[8] = 1;
      for (int i = 0; i < 3; ++i) p[i] = qj[i];
      const double ex[3] = {1, 0, 0}, ey[3] = {0, 1, 0}, ez[3] = {0, 0, 1};
      setcol(0, nullptr, ex);
      setcol(1, nullptr, ey);
      setcol(2, nullptr, ez);
      break;
    }
    case kPlanar: {
      rot_axis_angle(a3, qj[2], R);
      for (int i = 0; i < 3; ++i) p[i] = a1[i] * qj[0] + a2[i] * qj[1];
      double s1[3], s2[3];
      mat3_tvec(R, a1, s1);
      mat3_tvec(R, a2, s2);
      setcol(0, nullptr, s1);
      setcol(1, nullptr, s2);
      setcol(2, a3, nullptr);
      double d1[3], d2[3];
      cross3(a3, s1, d1);
      cross3(a3, s2, d2);
      for (int i = 0; i < 3; ++i) {
        d1[i] *= -dqj[2];
        d2[i] *= -dqj[2];
      }
      setcol_dot(0, nullptr, d1);
      setcol_dot(1, nullptr, d2);
      break;
    }
    case kFree: {
      so3_exp(qj, R);
      for (int i = 0; i < 3; ++i) p[i] = qj[3 + i];
      for (int c = 0; c < 6; ++c) S[c * kMaxDof + c] = 1.0;
      break;
    }
    default:
      std::memset(R, 0, 9 * sizeof(double));
      R[0] = R[4] = R[8] = 1;
  }
  (void)nd;
}

}  // namespace

extern "C" {

// Forward dynamics via ABA.  Layouts: row-major, shapes as commented in
// dartenv_tpu/model/skel_model.py.  Returns 0 on success.
int dartenv_aba(
    int nb, int n, const int* parent, const int* jtype, const int* q_start,
    const int* ndof, const double* pj_rot, const double* pj_pos,
    const double* cj_rot, const double* cj_pos, const double* axes,
    const double* mass, const double* com, const double* inertia,
    const double* damping, const double* spring, const double* rest_pos,
    const double* gravity, const double* q, const double* dq,
    const double* tau, double dt, const double* f_ext_world,
    double* ddq_out) {
  std::vector<double> E(nb * 9), r(nb * 3), v(nb * 6);
  std::vector<double> S(nb * 6 * kMaxDof), Sd(nb * 6 * kMaxDof);
  std::vector<double> Rw(nb * 9), pw(nb * 3);
  std::vector<double> c(nb * 6);

  // ---- FK + velocities ----
  for (int i = 0; i < nb; ++i) {
    const int a = q_start[i], nd = ndof[i];
    double Rj[9], pj[3];
    double Sj[6 * kMaxDof], Sdj[6 * kMaxDof];
    joint_kin(jtype[i], axes + i * 9, q + a, dq + a, Rj, pj, Sj, Sdj, nd);
    // T_rel = T_pj o T_joint o T_cj^-1
    double R1[9], p1[3];
    t_compose(pj_rot + i * 9, pj_pos + i * 3, Rj, pj, R1, p1);
    double cjR_inv[9], cjp_inv[3];
    // inv(R,p) = (R^T, -R^T p)
    for (int rr = 0; rr < 3; ++rr)
      for (int cc = 0; cc < 3; ++cc)
        cjR_inv[rr * 3 + cc] = cj_rot[i * 9 + cc * 3 + rr];
    mat3_vec(cjR_inv, cj_pos + i * 3, cjp_inv);
    for (int k = 0; k < 3; ++k) cjp_inv[k] = -cjp_inv[k];
    double R_rel[9], p_rel[3];
    t_compose(R1, p1, cjR_inv, cjp_inv, R_rel, p_rel);
    // S into child body frame: [cjR w; cjR v + cjp x (cjR w)]
    const double* cjR = cj_rot + i * 9;
    const double* cjp = cj_pos + i * 3;
    for (int col = 0; col < nd; ++col) {
      double w[3], vl[3];
      for (int k = 0; k < 3; ++k) {
        w[k] = Sj[k * kMaxDof + col];
        vl[k] = Sj[(k + 3) * kMaxDof + col];
      }
      double wb[3], vb[3], cx[3];
      mat3_vec(cjR, w, wb);
      mat3_vec(cjR, vl, vb);
      cross3(cjp, wb, cx);
      for (int k = 0; k < 3; ++k) {
        S[(i * 6 + k) * kMaxDof + col] = wb[k];
        S[(i * 6 + k + 3) * kMaxDof + col] = vb[k] + cx[k];
      }
      for (int k = 0; k < 3; ++k) {
        w[k] = Sdj[k * kMaxDof + col];
        vl[k] = Sdj[(k + 3) * kMaxDof + col];
      }
      mat3_vec(cjR, w, wb);
      mat3_vec(cjR, vl, vb);
      cross3(cjp, wb, cx);
      for (int k = 0; k < 3; ++k) {
        Sd[(i * 6 + k) * kMaxDof + col] = wb[k];
        Sd[(i * 6 + k + 3) * kMaxDof + col] = vb[k] + cx[k];
      }
    }
    // E = R_rel^T, r = p_rel
    for (int rr = 0; rr < 3; ++rr)
      for (int cc = 0; cc < 3; ++cc)
        E[i * 9 + rr * 3 + cc] = R_rel[cc * 3 + rr];
    std::memcpy(&r[i * 3], p_rel, 3 * sizeof(double));
    // world pose
    const int par = parent[i];
    if (par < 0) {
      std::memcpy(&Rw[i * 9], R_rel, 9 * sizeof(double));
      std::memcpy(&pw[i * 3], p_rel, 3 * sizeof(double));
    } else {
      mat3_mul(&Rw[par * 9], R_rel, &Rw[i * 9]);
      double t[3];
      mat3_vec(&Rw[par * 9], p_rel, t);
      for (int k = 0; k < 3; ++k) pw[i * 3 + k] = pw[par * 3 + k] + t[k];
    }
    // velocity: v_i = X v_par + S dq
    double vpar_x[6] = {0, 0, 0, 0, 0, 0};
    if (par >= 0) xmotion_apply(&E[i * 9], &r[i * 3], &v[par * 6], vpar_x);
    for (int k = 0; k < 6; ++k) {
      double s = vpar_x[k];
      for (int col = 0; col < nd; ++col)
        s += S[(i * 6 + k) * kMaxDof + col] * dq[a + col];
      v[i * 6 + k] = s;
    }
    // bias c_i = v x (S dq) + Sdot dq
    double vJ[6], cx6[6];
    for (int k = 0; k < 6; ++k) {
      double s = 0;
      for (int col = 0; col < nd; ++col)
        s += S[(i * 6 + k) * kMaxDof + col] * dq[a + col];
      vJ[k] = s;
    }
    crm(&v[i * 6], vJ, cx6);
    for (int k = 0; k < 6; ++k) {
      double s = cx6[k];
      for (int col = 0; col < nd; ++col)
        s += Sd[(i * 6 + k) * kMaxDof + col] * dq[a + col];
      c[i * 6 + k] = s;
    }
  }

  // ---- tip->root: articulated inertia + bias ----
  std::vector<double> IA(nb * 36), pA(nb * 6);
  std::vector<double> U(nb * 6 * kMaxDof), Dinv(nb * kMaxDof * kMaxDof),
      u(nb * kMaxDof);
  std::vector<double> tau_total(n);
  for (int d = 0; d < n; ++d)
    tau_total[d] = tau[d] - damping[d] * dq[d] -
                   spring[d] * (q[d] - rest_pos[d] + dt * dq[d]);

  for (int i = 0; i < nb; ++i) {
    spatial_inertia(mass[i], com + i * 3, inertia + i * 9, &IA[i * 36]);
    double Iv[6];
    mat6_vec(&IA[i * 36], &v[i * 6], Iv);
    crf(&v[i * 6], Iv, &pA[i * 6]);
    if (f_ext_world) {
      // world [torque; force] at body origin -> body frame
      double nb_[3], fb[3];
      mat3_tvec(&Rw[i * 9], f_ext_world + i * 6, nb_);
      mat3_tvec(&Rw[i * 9], f_ext_world + i * 6 + 3, fb);
      for (int k = 0; k < 3; ++k) {
        pA[i * 6 + k] -= nb_[k];
        pA[i * 6 + 3 + k] -= fb[k];
      }
    }
  }

  for (int i = nb - 1; i >= 0; --i) {
    const int a = q_start[i], nd = ndof[i];
    // U = IA S, D = S^T U (+ implicit), u = tau - S^T pA
    for (int k = 0; k < 6; ++k)
      for (int col = 0; col < nd; ++col) {
        double s = 0;
        for (int j = 0; j < 6; ++j)
          s += IA[i * 36 + k * 6 + j] * S[(i * 6 + j) * kMaxDof + col];
        U[(i * 6 + k) * kMaxDof + col] = s;
      }
    std::vector<double> D(nd * nd, 0.0);
    for (int rr = 0; rr < nd; ++rr)
      for (int cc = 0; cc < nd; ++cc) {
        double s = 0;
        for (int j = 0; j < 6; ++j)
          s += S[(i * 6 + j) * kMaxDof + rr] * U[(i * 6 + j) * kMaxDof + cc];
        if (rr == cc)
          s += dt * damping[a + rr] + dt * dt * spring[a + rr] + 1e-12;
        D[rr * nd + cc] = s;
      }
    // Dinv via solves against identity
    for (int col = 0; col < nd; ++col) {
      std::vector<double> e(nd, 0.0);
      e[col] = 1.0;
      solve_dense(nd, D, e.data());
      for (int rr = 0; rr < nd; ++rr)
        Dinv[(i * kMaxDof + rr) * kMaxDof + col] = e[rr];
    }
    for (int rr = 0; rr < nd; ++rr) {
      double s = tau_total[a + rr];
      for (int j = 0; j < 6; ++j)
        s -= S[(i * 6 + j) * kMaxDof + rr] * pA[i * 6 + j];
      u[i * kMaxDof + rr] = s;
    }
    const int par = parent[i];
    if (par >= 0) {
      // Ia = IA - U Dinv U^T ; pa = pA + Ia c + U Dinv u
      double Ia[36];
      std::memcpy(Ia, &IA[i * 36], 36 * sizeof(double));
      for (int rr = 0; rr < 6; ++rr)
        for (int cc = 0; cc < 6; ++cc) {
          double s = 0;
          for (int x = 0; x < nd; ++x)
            for (int y = 0; y < nd; ++y)
              s += U[(i * 6 + rr) * kMaxDof + x] *
                   Dinv[(i * kMaxDof + x) * kMaxDof + y] *
                   U[(i * 6 + cc) * kMaxDof + y];
          Ia[rr * 6 + cc] -= s;
        }
      double pa[6];
      double Iac[6];
      mat6_vec(Ia, &c[i * 6], Iac);
      double Dinv_u[kMaxDof];
      for (int rr = 0; rr < nd; ++rr) {
        double s = 0;
        for (int cc = 0; cc < nd; ++cc)
          s += Dinv[(i * kMaxDof + rr) * kMaxDof + cc] * u[i * kMaxDof + cc];
        Dinv_u[rr] = s;
      }
      for (int k = 0; k < 6; ++k) {
        double s = pA[i * 6 + k] + Iac[k];
        for (int rr = 0; rr < nd; ++rr)
          s += U[(i * 6 + k) * kMaxDof + rr] * Dinv_u[rr];
        pa[k] = s;
      }
      // X = xmotion(E, r); IA_par += X^T Ia X; pA_par += X^T pa
      double X[36];
      xmotion_mat(&E[i * 9], &r[i * 3], X);
      double IaX[36];
      for (int rr = 0; rr < 6; ++rr)
        for (int cc = 0; cc < 6; ++cc) {
          double s = 0;
          for (int k = 0; k < 6; ++k) s += Ia[rr * 6 + k] * X[k * 6 + cc];
          IaX[rr * 6 + cc] = s;
        }
      for (int rr = 0; rr < 6; ++rr)
        for (int cc = 0; cc < 6; ++cc) {
          double s = 0;
          for (int k = 0; k < 6; ++k) s += X[k * 6 + rr] * IaX[k * 6 + cc];
          IA[par * 36 + rr * 6 + cc] += s;
        }
      for (int rr = 0; rr < 6; ++rr) {
        double s = 0;
        for (int k = 0; k < 6; ++k) s += X[k * 6 + rr] * pa[k];
        pA[par * 6 + rr] += s;
      }
    }
  }

  // ---- root->tip: accelerations ----
  std::vector<double> acc(nb * 6);
  const double a_base[6] = {0, 0, 0, -gravity[0], -gravity[1], -gravity[2]};
  for (int i = 0; i < nb; ++i) {
    const int a = q_start[i], nd = ndof[i];
    const int par = parent[i];
    double a_prime[6];
    xmotion_apply(&E[i * 9], &r[i * 3],
                  par < 0 ? a_base : &acc[par * 6], a_prime);
    for (int k = 0; k < 6; ++k) a_prime[k] += c[i * 6 + k];
    double rhs[kMaxDof];
    for (int rr = 0; rr < nd; ++rr) {
      double s = u[i * kMaxDof + rr];
      for (int k = 0; k < 6; ++k)
        s -= U[(i * 6 + k) * kMaxDof + rr] * a_prime[k];
      rhs[rr] = s;
    }
    for (int rr = 0; rr < nd; ++rr) {
      double s = 0;
      for (int cc = 0; cc < nd; ++cc)
        s += Dinv[(i * kMaxDof + rr) * kMaxDof + cc] * rhs[cc];
      ddq_out[a + rr] = s;
    }
    for (int k = 0; k < 6; ++k) {
      double s = a_prime[k];
      for (int rr = 0; rr < nd; ++rr)
        s += S[(i * 6 + k) * kMaxDof + rr] * ddq_out[a + rr];
      acc[i * 6 + k] = s;
    }
  }
  return 0;
}

}  // extern "C"
