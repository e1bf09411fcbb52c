#!/usr/bin/env python
"""Adjudicate production residual offenders against the C++ golden
(VERDICT.md r3 order #2: "where the C++ golden adjudicates genuine
multiplicity — pin the per-task measured threshold").

Rolls a seeded contact-rich trajectory, collects every substep whose
production (warm-started hybrid) normalized complementarity residual
exceeds --tol, and asks three independent solvers whether ANY of them can
do better on the identical boxed LCP:

  * the C++ golden (native/lcp_dantzig.cpp, f64 incremental driving with
    a BPP fallback) from a cold start,
  * cold f32 block principal pivoting at the full budget,
  * warm f64 block principal pivoting at a deepened budget.

Findings recorded in docs/SOLVERS.md ("Residual tails, adjudicated"):
walker3d/dog offenders are degenerate (the golden returns bad=1 with the
same or worse residual); humanwalker offenders are f64-solvable but sit
at the f32 solver's precision ceiling on the m=47 operator.

Usage: python scripts/residual_adjudicate.py --env walker3d
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--device" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pgs_residual_study import comp_residual  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="walker3d")
    p.add_argument("--substeps", type=int, default=400)
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", action="store_true")
    args = p.parse_args(argv)

    from dartenv_tpu import native
    from dartenv_tpu.bench.throughput import make_task
    from dartenv_tpu.engine.world import (
        init_state, make_lcp_capture, make_sim_step,
    )
    from dartenv_tpu.lcp.dantzig import dantzig_solve

    task = make_task(args.env, dtype=jnp.float32)
    model = task.model
    step = jax.jit(make_sim_step(model))
    capture = jax.jit(make_lcp_capture(model))
    torque = {"walker2d": 100.0, "hopper": 200.0, "humanwalker": 100.0,
              "dog": 60.0, "walker3d": 100.0}.get(args.env, 50.0)
    state = init_state(model, warm_start=True)
    rng = np.random.default_rng(args.seed)
    tau = jnp.zeros(model.n, dtype=jnp.float32)

    rows, all_res = [], []
    for k in range(args.substeps):
        if k % task.frame_skip == 0:
            a = rng.uniform(-1.0, 1.0, model.n - 3)
            tau = jnp.zeros(model.n, dtype=jnp.float32).at[3:].set(
                jnp.asarray(a, dtype=jnp.float32) * torque)
        prob = capture(state, tau)
        lam = np.asarray(prob["lam"], dtype=np.float64)
        if np.abs(lam).max() > 1e-9:
            act = np.asarray(prob["active"]) > 0.5
            A = np.asarray(prob["A"], np.float64)
            b = np.asarray(prob["b"], np.float64)
            lo = np.where(act, np.asarray(prob["lo"], np.float64), 0.0)
            hi = np.where(act, np.asarray(prob["hi"], np.float64), 0.0)
            mu = np.asarray(prob["mu"], np.float64)
            fin = np.asarray(prob["findex"])
            sc = max(1.0, np.abs(lam).max())
            r = comp_residual(A, b, lam, lo, hi, fin, mu,
                              act.astype(float)) / sc
            all_res.append(r)
            if r > args.tol:
                x_cpp, _, bad = native.lcp_solve(A, b, lo, hi, fin, mu)
                r_cpp = comp_residual(A, b, x_cpp, lo, hi, fin, mu,
                                      act.astype(float)) \
                    / max(1.0, np.abs(x_cpp).max())
                f32 = lambda v: jnp.asarray(prob[v], jnp.float32)  # noqa
                x_c32 = dantzig_solve(f32("A"), f32("b"), f32("lo"),
                                      f32("hi"), fin, f32("mu"),
                                      f32("active"), iters=24,
                                      polish_iters=10)
                r_c32 = comp_residual(
                    A, b, np.asarray(x_c32, np.float64), lo, hi, fin, mu,
                    act.astype(float)) / max(1.0, np.abs(x_c32).max())
                x_w64 = dantzig_solve(
                    jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo),
                    jnp.asarray(hi), fin, jnp.asarray(mu),
                    jnp.asarray(act.astype(float)), iters=40,
                    polish_iters=10, lam0=jnp.asarray(lam))
                r_w64 = comp_residual(
                    A, b, np.asarray(x_w64), lo, hi, fin, mu,
                    act.astype(float)) / max(1.0, np.abs(np.asarray(x_w64)).max())
                rows.append((k, r, r_cpp, bad, r_c32, r_w64, sc))
        state, _ = step(state, tau)

    ar = np.asarray(all_res)
    print(f"{args.env}: {len(all_res)} contact substeps, production "
          f"median={np.median(ar):.2e} p95={np.percentile(ar, 95):.2e} "
          f"max={ar.max():.2e}; offenders > {args.tol:.0e}: {len(rows)}")
    for k, r, r_cpp, bad, r_c32, r_w64, sc in rows:
        print(f"  k={k}: prod={r:.2e} cpp_golden={r_cpp:.2e}(bad={bad}) "
              f"cold-bpp-f32={r_c32:.2e} warm-bpp-f64-40={r_w64:.2e} "
              f"scale={sc:.3f}")


if __name__ == "__main__":
    main()
