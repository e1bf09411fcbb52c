#!/usr/bin/env python
"""Post-escalation residual envelope at PRODUCTION batch sizes
(VERDICT r4 weak #5 / order #6: escalate_kmax=128 halves relative
escalation coverage at B=8192 and quarters it at 16384 — measure the
envelope there instead of arguing from the small-B study).

Drives the fused-substep kernel + escalation exactly as production does
(engine/pallas_substep._kernel_path), but through escalate_batch's
with_diag hook: per substep it records percentiles of the FULL batch's
post-escalation normalized complementarity residual (every env's fused
kernel residual, the escalated K overwritten by their kept points').

Run on the TPU (sequential with other chip users!):
  python scripts/residual_envelope.py --env walker2d --batch 8192
  python scripts/residual_envelope.py --env humanwalker --batch 8192
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_p = argparse.ArgumentParser()
_p.add_argument("--env", default="walker2d")
_p.add_argument("--batch", type=int, default=8192)
_p.add_argument("--substeps", type=int, default=400)
_p.add_argument("--seed", type=int, default=0)
_p.add_argument("--cpu", action="store_true")
_p.add_argument("--ref64", type=int, default=-1,
                help=">=0: override escalate_ref64 (enables x64)")
_p.add_argument("--ref", type=int, default=-1,
                help=">=0: override escalate_ref (compensated, no x64)")
_p.add_argument("--warmup", type=int, default=100,
                help="substeps of synchronized-impact transient reported separately")
_p.add_argument("--kmax", type=int, default=0,
                help=">0: override escalate_kmax")
_p.add_argument("--iters", type=int, default=0,
                help=">0: override escalate_iters (tier-1 warm budget)")
_p.add_argument("--iters2", type=int, default=-1,
                help=">=0: override escalate_iters2 (0 disables tier 2)")
_p.add_argument("--pgs_iters", type=int, default=0,
                help=">0: override pgs_iters")
_p.add_argument("--frac", type=float, default=0.0,
                help=">0: override escalate_frac")
_ARGS = _p.parse_args()

if _ARGS.cpu:
    jax.config.update("jax_platforms", "cpu")
if _ARGS.ref64 >= 0:
    jax.config.update("jax_enable_x64", True)
from dartenv_tpu.bench.throughput import _machine_cache_dir
jax.config.update("jax_compilation_cache_dir", _machine_cache_dir("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402


def main():
    from dartenv_tpu.bench.throughput import make_task
    from dartenv_tpu.engine.pallas_substep import (
        _SubStatic, escalate_batch, substep_pallas,
    )
    from dartenv_tpu.envs.base import with_solver
    from dartenv_tpu.dynamics import batched
    from dartenv_tpu.lcp.dantzig import make_exact_solver

    env, B, T = _ARGS.env, _ARGS.batch, _ARGS.substeps
    task = make_task(env, dtype=jnp.float32)
    model = task.model
    if _ARGS.ref64 >= 0:
        model = with_solver(model, None, escalate_ref64=_ARGS.ref64)
    if _ARGS.ref >= 0:
        model = with_solver(model, None, escalate_ref=_ARGS.ref)
    if _ARGS.kmax > 0:
        model = with_solver(model, None, escalate_kmax=_ARGS.kmax)
    if _ARGS.iters > 0:
        model = with_solver(model, None, escalate_iters=_ARGS.iters)
    if _ARGS.iters2 >= 0:
        model = with_solver(model, None, escalate_iters2=_ARGS.iters2)
    if _ARGS.pgs_iters > 0:
        model = with_solver(model, None, pgs_iters=_ARGS.pgs_iters)
    if _ARGS.frac > 0:
        model = with_solver(model, None, escalate_frac=_ARGS.frac)
    cfg = model.solver
    assert cfg.escalate_frac > 0.0, "escalation disabled for this task"
    st = _SubStatic(model)
    dt = float(model.dt)
    ref64 = (int(cfg.escalate_ref64)
             if jax.config.jax_enable_x64 else 0)
    refc = 0 if ref64 > 0 else int(cfg.escalate_ref)

    exact1 = make_exact_solver(
        st.findex_c, iters=cfg.escalate_iters, polish_iters=3,
        refine_iters=(None if cfg.escalate_refine < 0
                      else cfg.escalate_refine))
    exact2 = (make_exact_solver(st.findex_c, iters=cfg.escalate_iters2,
                                polish_iters=6)
              if cfg.escalate_iters2 > 0 else None)

    pcts = jnp.asarray([50.0, 95.0, 99.0, 99.9, 100.0])

    # --cpu: interpret-mode smoke only (tiny B; eager, no jit)
    maybe_jit = (lambda f: f) if _ARGS.cpu else jax.jit

    @maybe_jit
    def sub_diag(q, dq, lam, tau):
        outs = substep_pallas(model, q, dq, tau, lam, st=st,
                              interpret=_ARGS.cpu)
        dqp, lamf, diag = escalate_batch(
            st, cfg, outs, outs["dq_plus"], outs["lam_full"],
            exact1, exact2, jnp.float32, ref64_passes=ref64,
            refc_passes=refc,
            with_diag=True)
        qn = jax.vmap(
            lambda qq, dd: batched.integrate_positions(model, qq, dd, dt)
        )(q, dqp)
        p = jnp.percentile(diag["envelope"], pcts)
        return qn, dqp, lamf, p

    rng = np.random.default_rng(_ARGS.seed)
    n = model.n
    q = jnp.broadcast_to(model.q_init, (B, n)) + jnp.asarray(
        rng.uniform(-0.005, 0.005, (B, n)), jnp.float32)
    dq = jnp.asarray(rng.uniform(-0.005, 0.005, (B, n)), jnp.float32)
    lam = jnp.zeros((B, st.layout.m), jnp.float32)
    tau = jnp.zeros((B, n), jnp.float32)
    torque = {"walker2d": 100.0, "hopper": 200.0, "humanwalker": 100.0,
              "dog": 60.0, "walker3d": 100.0}.get(env, 50.0)

    rows = []
    for k in range(T):
        if k % task.frame_skip == 0:
            a = rng.uniform(-1.0, 1.0, (B, n - 3))
            tau = jnp.zeros((B, n), jnp.float32).at[:, 3:].set(
                jnp.asarray(a, jnp.float32) * torque)
        q, dq, lam, p = sub_diag(q, dq, lam, tau)
        rows.append(np.asarray(p))
    rows = np.stack(rows)          # (T, 5)

    # The first ~100 substeps are a SYNCHRONIZED-IMPACT transient: every
    # env starts at q_init +- 0.005 so initial ground impacts land on the
    # same few substeps and the count of high-residual envs can exceed
    # the escalation capacity K at exactly those substeps.  Production
    # training desynchronizes within an episode (randomized resets), so
    # report the transient window and the steady state separately.
    warm = min(_ARGS.warmup, T // 2)

    def agg_window(w):
        mx = {f"p{v:g}": float(x) for v, x in
              zip([50, 95, 99, 99.9, 100], w.max(axis=0))}
        med = {f"p{v:g}_med": float(x) for v, x in
               zip([50, 95, 99, 99.9, 100], np.median(w, axis=0))}
        return dict(worst_over_substeps=mx, median_over_substeps=med)

    print(json.dumps(dict(env=env, batch=B, substeps=T,
                          kmax=int(cfg.escalate_kmax),
                          frac=float(cfg.escalate_frac),
                          ref64=ref64,
                          backend=jax.default_backend(),
                          transient=agg_window(rows[:warm]),
                          steady=agg_window(rows[warm:]))))


if __name__ == "__main__":
    main()
