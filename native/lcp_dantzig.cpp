// Boxed-LCP solver: incremental Dantzig driving with principal submatrix
// solves, plus an outer fixed-point loop for ODE-style `findex` friction
// coupling.
//
// Role in this framework: host-side GOLDEN reference for the on-device
// solvers (dartenv_tpu/lcp/{pgs,dantzig,pallas_pgs}.py).  It fills the slot
// the reference stack fills with ODE's C `dSolveLCP`
// (dart/external/odelcpsolver/lcp.cpp †, see SURVEY.md §2.4 "LCP solvers")
// — this is a clean-room implementation of the published algorithm
// (Baraff 1994 Fast Contact Force Computation, extended to boxed bounds),
// NOT a translation of the ODE source.
//
// Problem: find x with  w = A x + b,  lo <= x <= hi  and per row i
//     x_i = lo_i  =>  w_i >= 0
//     x_i = hi_i  =>  w_i <= 0
//     lo_i < x_i < hi_i  =>  w_i = 0
// Friction rows have findex[i] >= 0 and bounds +-mu_i * x_{findex[i]},
// re-evaluated from the current normal impulses (outer loop).
//
// A is symmetric positive definite (J M^-1 J^T + cfm*I), sizes are tiny
// (<= ~64 rows for these tasks), so dense O(m^3) pivoting is fine on host.
//
// C API (ctypes-friendly), all double precision:
//   int dartenv_lcp_solve(int m, const double* A, const double* b,
//                         const double* lo, const double* hi,
//                         const int* findex, const double* mu,
//                         double* x_out, double* w_out);
// Returns 0 on success, >0 = number of rows with complementarity residual
// above tolerance after the iteration budget (solution still written).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kBig = 1e20;
constexpr double kTol = 1e-10;

// Solve A_FF y = rhs restricted to the index set F (dense Cholesky on the
// gathered principal submatrix; m is tiny so gather+factor is cheap).
bool solve_principal(const std::vector<double>& A, int m,
                     const std::vector<int>& F, const double* rhs,
                     double* y) {
  const int k = static_cast<int>(F.size());
  if (k == 0) return true;
  std::vector<double> L(static_cast<size_t>(k) * k);
  for (int r = 0; r < k; ++r)
    for (int c = 0; c < k; ++c)
      L[static_cast<size_t>(r) * k + c] = A[static_cast<size_t>(F[r]) * m + F[c]];
  // in-place Cholesky (lower)
  for (int j = 0; j < k; ++j) {
    double d = L[static_cast<size_t>(j) * k + j];
    for (int p = 0; p < j; ++p) {
      const double v = L[static_cast<size_t>(j) * k + p];
      d -= v * v;
    }
    if (d <= 0.0) d = 1e-14;  // regularize: A is PD up to roundoff
    d = std::sqrt(d);
    L[static_cast<size_t>(j) * k + j] = d;
    for (int i = j + 1; i < k; ++i) {
      double s = L[static_cast<size_t>(i) * k + j];
      for (int p = 0; p < j; ++p)
        s -= L[static_cast<size_t>(i) * k + p] * L[static_cast<size_t>(j) * k + p];
      L[static_cast<size_t>(i) * k + j] = s / d;
    }
  }
  std::vector<double> z(k);
  for (int i = 0; i < k; ++i) {
    double s = rhs[i];
    for (int p = 0; p < i; ++p) s -= L[static_cast<size_t>(i) * k + p] * z[p];
    z[i] = s / L[static_cast<size_t>(i) * k + i];
  }
  for (int i = k - 1; i >= 0; --i) {
    double s = z[i];
    for (int p = i + 1; p < k; ++p) s -= L[static_cast<size_t>(p) * k + i] * y[p];
    y[i] = s / L[static_cast<size_t>(i) * k + i];
  }
  return true;
}

enum SetLabel { kUnprocessed = 0, kFree = 1, kAtLo = 2, kAtHi = 3 };

// Solve the fixed-bound boxed LCP by incremental Dantzig driving.
// x/w are (m); labels record the final index sets.
int dantzig_fixed_bounds(int m, const std::vector<double>& A,
                         const double* b, const double* lo, const double* hi,
                         double* x, double* w, std::vector<int>& label) {
  std::fill(x, x + m, 0.0);
  std::fill(label.begin(), label.end(), kUnprocessed);
  for (int i = 0; i < m; ++i) w[i] = b[i];

  std::vector<int> F;            // free set (w = 0)
  std::vector<double> dxF(m), rhs(m), dx(m), dw(m);

  for (int d = 0; d < m; ++d) {
    // rows with zero range are permanently clamped at their bound
    if (hi[d] - lo[d] <= kTol && std::abs(lo[d]) <= kTol) {
      label[d] = kAtLo;  // x_d == 0 fixed
      continue;
    }
    // already satisfied at x_d = 0?
    if (w[d] >= -kTol && lo[d] <= kTol && 0.0 <= hi[d] + kTol) {
      // starting point x_d = 0 with w_d >= 0: clamp at lo if lo == 0,
      // otherwise still must drive (lo < 0 means 0 is interior and w!=0
      // violates complementarity)
      if (std::abs(lo[d]) <= kTol) { label[d] = kAtLo; continue; }
    }
    if (w[d] <= kTol && std::abs(hi[d]) <= kTol) { label[d] = kAtHi; continue; }

    // drive x_d until w_d = 0 or x_d hits a bound
    int guard = 4 * m + 10;
    while (guard-- > 0) {
      const double dir = (w[d] > 0.0) ? -1.0 : 1.0;  // move x_d against w_d
      // delta x on F from unit step of x_d: A_FF dxF = -A_F,d * dir
      const int k = static_cast<int>(F.size());
      for (int r = 0; r < k; ++r)
        rhs[r] = -dir * A[static_cast<size_t>(F[r]) * m + d];
      solve_principal(A, m, F, rhs.data(), dxF.data());
      // assemble full-space direction
      std::fill(dx.begin(), dx.end(), 0.0);
      dx[d] = dir;
      for (int r = 0; r < k; ++r) dx[F[r]] = dxF[r];
      for (int i = 0; i < m; ++i) {
        double s = 0.0;
        for (int j = 0; j < m; ++j) s += A[static_cast<size_t>(i) * m + j] * dx[j];
        dw[i] = s;
      }
      // max step before an event
      double step = kBig;
      int limit_idx = d;
      int limit_kind = 0;  // 0: w_d -> 0, 1: x hits lo, 2: x hits hi, 3: F row w stays 0 but x leaves box, 4: clamped row w crosses 0
      if (std::abs(dw[d]) > kTol) {
        const double s = -w[d] / dw[d];
        if (s >= 0.0 && s < step) { step = s; limit_idx = d; limit_kind = 0; }
      }
      // driving variable itself hitting its own bound
      if (dx[d] > kTol) {
        const double s = (hi[d] - x[d]) / dx[d];
        if (s >= 0.0 && s < step) { step = s; limit_idx = d; limit_kind = 2; }
      } else if (dx[d] < -kTol) {
        const double s = (lo[d] - x[d]) / dx[d];
        if (s >= 0.0 && s < step) { step = s; limit_idx = d; limit_kind = 1; }
      }
      // free rows leaving the box
      for (int r = 0; r < k; ++r) {
        const int i = F[r];
        if (dx[i] > kTol) {
          const double s = (hi[i] - x[i]) / dx[i];
          if (s >= 0.0 && s < step) { step = s; limit_idx = i; limit_kind = 2; }
        } else if (dx[i] < -kTol) {
          const double s = (lo[i] - x[i]) / dx[i];
          if (s >= 0.0 && s < step) { step = s; limit_idx = i; limit_kind = 1; }
        }
      }
      // clamped processed rows whose w crosses back through 0
      for (int i = 0; i < d; ++i) {
        if (label[i] == kAtLo && dw[i] < -kTol) {
          const double s = -w[i] / dw[i];
          if (s >= 0.0 && s < step) { step = s; limit_idx = i; limit_kind = 4; }
        } else if (label[i] == kAtHi && dw[i] > kTol) {
          const double s = -w[i] / dw[i];
          if (s >= 0.0 && s < step) { step = s; limit_idx = i; limit_kind = 4; }
        }
      }
      if (step >= kBig) {
        // unbounded ray (should not happen for PD A): clamp driving var
        label[d] = (dir > 0) ? kAtHi : kAtLo;
        x[d] = (dir > 0) ? hi[d] : lo[d];
        break;
      }
      // take the step
      for (int i = 0; i < m; ++i) {
        x[i] += step * dx[i];
        w[i] += step * dw[i];
      }
      // snap
      if (limit_kind == 1) x[limit_idx] = lo[limit_idx];
      if (limit_kind == 2) x[limit_idx] = hi[limit_idx];
      if (limit_kind == 0) w[limit_idx] = 0.0;

      if (limit_idx == d) {
        if (limit_kind == 0) {
          label[d] = kFree;
          F.push_back(d);
        } else {
          label[d] = (limit_kind == 2) ? kAtHi : kAtLo;
        }
        break;  // next driving variable
      }
      // pivot an earlier row and keep driving
      if (limit_kind == 4) {
        label[limit_idx] = kFree;
        F.push_back(limit_idx);
        w[limit_idx] = 0.0;
      } else {
        label[limit_idx] = (limit_kind == 2) ? kAtHi : kAtLo;
        for (size_t r = 0; r < F.size(); ++r)
          if (F[r] == limit_idx) { F.erase(F.begin() + r); break; }
      }
    }
    if (label[d] == kUnprocessed) label[d] = kFree;  // guard exhausted
  }
  // recompute w exactly
  for (int i = 0; i < m; ++i) {
    double s = b[i];
    for (int j = 0; j < m; ++j) s += A[static_cast<size_t>(i) * m + j] * x[j];
    w[i] = s;
  }
  return 0;
}

double max_abs(int m, const double* v) {
  double s = 0.0;
  for (int i = 0; i < m; ++i) s = std::max(s, std::abs(v[i]));
  return s;
}

int residual_violations(int m, const double* x, const double* w,
                        const double* lo, const double* hi) {
  int bad = 0;
  const double tol = 1e-7;
  const double wscale = std::max(1.0, max_abs(m, w));
  for (int i = 0; i < m; ++i) {
    const double span = std::max(1.0, std::abs(hi[i]) < kBig ? hi[i] : 1.0);
    if (x[i] < lo[i] - tol * span || x[i] > hi[i] + tol * span) { ++bad; continue; }
    const bool at_lo = x[i] <= lo[i] + tol * span;
    const bool at_hi = x[i] >= hi[i] - tol * span;
    if (at_lo && w[i] >= -tol * wscale) continue;
    if (at_hi && w[i] <= tol * wscale) continue;
    if (std::abs(w[i]) <= tol * wscale) continue;
    ++bad;
  }
  return bad;
}

}  // namespace

extern "C" {

int dartenv_lcp_solve(int m, const double* A_in, const double* b,
                      const double* lo_in, const double* hi_in,
                      const int* findex, const double* mu,
                      double* x_out, double* w_out) {
  if (m <= 0) return 0;
  std::vector<double> A(A_in, A_in + static_cast<size_t>(m) * m);
  std::vector<double> lo(lo_in, lo_in + m), hi(hi_in, hi_in + m);
  std::vector<double> x(m, 0.0), w(m, 0.0);
  std::vector<int> label(m);

  bool any_friction = false;
  for (int i = 0; i < m; ++i)
    if (findex && findex[i] >= 0) any_friction = true;

  // Outer fixed-point loop on the findex friction bounds, DAMPED: the
  // undamped map x -> solve(bounds(x)) oscillates on sliding contacts
  // (spectral radius near 1); averaging the bound source halves the
  // oscillation and converges in ~10-20 solves on contact problems.
  const int outer = any_friction ? 100 : 1;
  const double damp = 0.5;
  std::vector<double> xb(m, 0.0);  // damped impulse source for the bounds
  for (int it = 0; it < outer; ++it) {
    // refresh friction bounds from the damped normal impulses
    if (findex) {
      for (int i = 0; i < m; ++i) {
        if (findex[i] >= 0) {
          const double bound = std::abs(mu ? mu[i] : 1.0) * std::abs(xb[findex[i]]);
          lo[i] = std::max(lo_in[i], -bound);
          hi[i] = std::min(hi_in[i], bound);
        }
      }
    }
    std::vector<double> x_prev(x);
    dantzig_fixed_bounds(m, A, b, lo.data(), hi.data(), x.data(), w.data(),
                         label);
    if (any_friction) {
      double diff = 0.0;
      for (int i = 0; i < m; ++i) diff = std::max(diff, std::abs(x[i] - x_prev[i]));
      for (int i = 0; i < m; ++i) xb[i] = damp * xb[i] + (1.0 - damp) * x[i];
      // converged only when the damped bound source has caught up too —
      // otherwise the final solve is inconsistent with bounds(x)
      double lag = 0.0;
      for (int i = 0; i < m; ++i) lag = std::max(lag, std::abs(xb[i] - x[i]));
      if (it > 0 && diff < 1e-13 && lag < 1e-12) break;
    }
  }
  // Final polish: projected Gauss-Seidel with LIVE findex bounds
  // (bounds refreshed from the current x inside the sweep).  The damped
  // outer loop can stall on oscillating sliding contacts (the friction
  // fixed point has spectral radius ~1 under the damped map); from the
  // pivoting solution PGS descends linearly to a self-consistent
  // complementarity point of bounds(x).
  if (any_friction) {
    for (int s = 0; s < 500; ++s) {
      double delta = 0.0;
      for (int i = 0; i < m; ++i) {
        double lo_i = lo_in[i], hi_i = hi_in[i];
        if (findex && findex[i] >= 0) {
          const double bound =
              std::abs(mu ? mu[i] : 1.0) * std::abs(x[findex[i]]);
          lo_i = std::max(lo_i, -bound);
          hi_i = std::min(hi_i, bound);
        }
        const double aii = A[static_cast<size_t>(i) * m + i];
        if (aii <= 0.0) continue;
        double wi = b[i];
        for (int j = 0; j < m; ++j)
          wi += A[static_cast<size_t>(i) * m + j] * x[j];
        double xn = std::min(std::max(x[i] - wi / aii, lo_i), hi_i);
        delta = std::max(delta, std::abs(xn - x[i]));
        x[i] = xn;
      }
      if (delta < 1e-14) break;
    }
  }
  // Fallback for the rare stall: stateful block principal pivoting
  // (Judice-Pires family) from a COLD start, with a damped friction-bound
  // source.  The incremental-driving path above plus the PGS polish
  // resolves ~all substeps, but PGS converges only linearly and can stall
  // above the reporting tolerance on ill-conditioned free blocks
  // (observed: one walker2d substep in 1000 stalling at |w| ~ 2e-5 after
  // 500 sweeps while an exact free-block solve reaches 1e-11).  Restarting
  // matters: from the stalled point the pivot-set sequence oscillates, but
  // from x = 0 with the natural partition (only violated normals free) the
  // damped set sequence closes.  The better point by max complementarity
  // residual — a solver-independent criterion — is kept, so the primary
  // path remains the independent cross-check for the on-device solvers.
  {
    auto live_bounds = [&](const std::vector<double>& src) {
      for (int i = 0; i < m; ++i) {
        lo[i] = lo_in[i];
        hi[i] = hi_in[i];
        if (findex && findex[i] >= 0) {
          const double bound =
              std::abs(mu ? mu[i] : 1.0) * std::abs(src[findex[i]]);
          lo[i] = std::max(lo_in[i], -bound);
          hi[i] = std::min(hi_in[i], bound);
        }
      }
    };
    auto compute_w = [&](const std::vector<double>& xs,
                         std::vector<double>& ws) {
      for (int i = 0; i < m; ++i) {
        double s = b[i];
        for (int j = 0; j < m; ++j)
          s += A[static_cast<size_t>(i) * m + j] * xs[j];
        ws[i] = s;
      }
    };
    auto max_residual = [&](const std::vector<double>& xs,
                            const std::vector<double>& ws) {
      // max complementarity violation at bounds currently in lo/hi
      double r = 0.0;
      for (int i = 0; i < m; ++i) {
        const bool at_lo = xs[i] <= lo[i] + 1e-9;
        const bool at_hi = xs[i] >= hi[i] - 1e-9;
        double ri;
        if (at_lo && at_hi) ri = 0.0;
        else if (at_lo) ri = -ws[i];
        else if (at_hi) ri = ws[i];
        else ri = std::abs(ws[i]);
        ri = std::max(ri, std::max(lo[i] - xs[i], xs[i] - hi[i]));
        r = std::max(r, ri);
      }
      return r;
    };
    auto residual_at = [&](std::vector<double>& xs, std::vector<double>& ws) {
      live_bounds(xs);
      compute_w(xs, ws);
      return max_residual(xs, ws);
    };
    std::vector<double> w_cur(m);
    const double primary = residual_at(x, w_cur);
    const double xscale = std::max(1.0, max_abs(m, x.data()));
    if (primary > 1e-9 * xscale) {
      std::vector<double> xt(m, 0.0), xb2(m, 0.0), wt(m), rhs(m), yF(m);
      std::vector<int> st(m);  // 0 free, 1 at-lo, 2 at-hi
      for (int i = 0; i < m; ++i)
        st[i] = (std::abs(lo_in[i]) <= kTol && b[i] < 0.0) ? 0 : 1;
      auto bpp_pass = [&](const std::vector<double>& bound_src) {
        live_bounds(bound_src);
        std::vector<int> F;
        for (int i = 0; i < m; ++i) {
          if (st[i] == 0 && hi[i] - lo[i] > kTol) { F.push_back(i); continue; }
          xt[i] = (st[i] == 2) ? hi[i] : lo[i];
        }
        const int k = static_cast<int>(F.size());
        for (int r = 0; r < k; ++r) {
          double s = b[F[r]];
          for (int j = 0; j < m; ++j) {
            bool in_F = false;
            for (int q = 0; q < k; ++q)
              if (F[q] == j) { in_F = true; break; }
            if (!in_F) s += A[static_cast<size_t>(F[r]) * m + j] * xt[j];
          }
          rhs[r] = -s;
        }
        solve_principal(A, m, F, rhs.data(), yF.data());
        for (int r = 0; r < k; ++r) xt[F[r]] = yF[r];
        compute_w(xt, wt);
        for (int r = 0; r < k; ++r) {
          const int i = F[r];
          if (xt[i] < lo[i] - kTol) st[i] = 1;
          else if (xt[i] > hi[i] + kTol) st[i] = 2;
        }
        for (int i = 0; i < m; ++i) {
          if (st[i] == 1 && wt[i] < -kTol) st[i] = 0;
          else if (st[i] == 2 && wt[i] > kTol) st[i] = 0;
        }
        for (int i = 0; i < m; ++i)
          xt[i] = std::min(std::max(xt[i], lo[i]), hi[i]);
      };
      for (int it = 0; it < 24; ++it) {
        bpp_pass(xb2);
        for (int i = 0; i < m; ++i) xb2[i] = 0.5 * (xb2[i] + xt[i]);
      }
      std::vector<double> x_undamped = xt;
      for (int it = 0; it < 8; ++it) {
        x_undamped = xt;
        bpp_pass(x_undamped);
      }
      if (residual_at(xt, wt) < primary) x = xt;
    }
  }
  // report the residual at x's OWN friction fixed point (bounds(x)) —
  // the honest convergence statement; the stale xb-based bounds can
  // claim convergence the solution does not have
  if (findex) {
    for (int i = 0; i < m; ++i) {
      if (findex[i] >= 0) {
        const double bound =
            std::abs(mu ? mu[i] : 1.0) * std::abs(x[findex[i]]);
        lo[i] = std::max(lo_in[i], -bound);
        hi[i] = std::min(hi_in[i], bound);
      }
    }
  } else {
    for (int i = 0; i < m; ++i) { lo[i] = lo_in[i]; hi[i] = hi_in[i]; }
  }
  for (int i = 0; i < m; ++i) {
    double s = b[i];
    for (int j = 0; j < m; ++j)
      s += A[static_cast<size_t>(i) * m + j] * x[j];
    w[i] = s;
  }
  std::memcpy(x_out, x.data(), sizeof(double) * m);
  if (w_out) std::memcpy(w_out, w.data(), sizeof(double) * m);
  return residual_violations(m, x.data(), w.data(), lo.data(), hi.data());
}

}  // extern "C"
