"""Production PGS configuration stays within the studied residual envelope.

Companion to scripts/pgs_residual_study.py (full study; findings recorded
in docs/SOLVERS.md).  The study answered VERDICT.md r1 weak #4 ("default
PGS iteration counts are a tuned guess") with committed numbers; this test
pins the envelope on real contact-rich env states so a regression in the
solver, the assembly, or the warm-start plumbing shows up as a residual
blow-up rather than silently different physics.

Residual metric: max complementarity violation of the boxed LCP at the
solver's own friction-bound fixed point (same definition as
tests/test_exact_solver.py), normalized by the impulse scale.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartenv_tpu.engine.world import init_state, make_lcp_capture, \
    make_sim_step


def comp_residual(A, b, x, lo, hi, findex, mu, active):
    lo, hi = lo.copy(), hi.copy()
    fmask = findex >= 0
    if fmask.any():
        bd = mu[fmask] * np.abs(x[findex[fmask]])
        lo[fmask] = np.maximum(lo[fmask], -bd)
        hi[fmask] = np.minimum(hi[fmask], bd)
    w = A @ x + b
    at_lo = x <= lo + 1e-9
    at_hi = x >= hi - 1e-9
    res = np.where(at_lo & at_hi, 0.0,
                   np.where(at_lo, -w,
                            np.where(at_hi, w, np.abs(w))))
    res = np.maximum(res, np.maximum(lo - x, x - hi))
    res = np.where(active > 0.5, res, 0.0)
    return float(res.max(initial=0.0))


# Per-task envelopes (docs/SOLVERS.md study + the round-4 C++-golden
# adjudication of every production offender > 1e-4):
#   * walker2d/hopper: escalation holds the exact-solver tail — median
#     ~1e-7, p95 ~1.5e-6, max ~9e-6; pinned a decade up.
#   * walker3d: residual tail ~2.3e-3 is GOLDEN-ADJUDICATED degenerate —
#     the C++ exact solver returns bad=1 with the same residual on the
#     identical problems, and cold f64 block pivoting + 500 f64 PGS
#     sweeps cannot improve them: grazing contacts (impulse scale ~3e-3)
#     whose findex friction fixed point does not exist to tighter
#     tolerance.  Pinned at the measured ceiling so a REGRESSION still
#     fails loudly.
#   * dog: the r4 refinement-budget study (escalate_refine=2) removed
#     its old 1.6e-3 tail entirely — the long undamped refinement was
#     RE-oscillating the 4-foot friction fixed point.  Measured max
#     9.9e-6; pinned at the planar envelope.
#   * humanwalker: offenders ARE solvable in f64 (golden: 1e-14); the
#     r5 production escalation (warm-16 tier-1 + 2 compensated
#     double-float refinement passes, lcp/dantzig.refine_compensated)
#     beats the r4 two-tier on every percentile: med 1.1e-6, p95
#     1.2e-5, max 1.5e-3 measured (two-tier was 2.2e-5 / 1.9e-3;
#     flat-20 left 2.6e-2).  The max is wrong-partition substeps the
#     keep-best refinement rejects rather than worsens.  Pinned with
#     ~8x slack on p95, ~3x on max.
@pytest.mark.parametrize("env,torque,bounds", [
    ("walker2d", 100.0, (1e-6, 1e-5, 1e-4)),
    ("hopper", 200.0, (1e-6, 1e-5, 1e-4)),
    ("walker3d", 100.0, (1e-5, 1e-4, 5e-3)),
    ("dog", 60.0, (1e-5, 1e-4, 1e-4)),
    ("humanwalker", 100.0, (1e-5, 1e-4, 5e-3)),
])
def test_production_pgs_residual_envelope(env, torque, bounds):
    """Warm-started production PGS on seeded contact-rich rollouts keeps
    normalized complementarity residuals within the envelope recorded in
    docs/SOLVERS.md (with slack for platform variation)."""
    from dartenv_tpu.bench.throughput import make_task

    task = make_task(env, dtype=jnp.float32)
    model = task.model
    step = jax.jit(make_sim_step(model))
    capture = jax.jit(make_lcp_capture(model))

    state = init_state(model, warm_start=True)
    rng = np.random.default_rng(0)
    tau = jnp.zeros(model.n, dtype=jnp.float32)

    residuals = []
    for k in range(160):
        if k % task.frame_skip == 0:
            a = rng.uniform(-1.0, 1.0, model.n - 3)
            tau = jnp.zeros(model.n, dtype=jnp.float32).at[3:].set(
                jnp.asarray(a, dtype=jnp.float32) * torque)
        prob = capture(state, tau)
        lam = np.asarray(prob["lam"], dtype=np.float64)
        if np.abs(lam).max() > 1e-9:
            active = np.asarray(prob["active"]) > 0.5
            residuals.append(comp_residual(
                np.asarray(prob["A"], np.float64),
                np.asarray(prob["b"], np.float64),
                lam,
                np.where(active, np.asarray(prob["lo"], np.float64), 0.0),
                np.where(active, np.asarray(prob["hi"], np.float64), 0.0),
                np.asarray(prob["findex"]),
                np.asarray(prob["mu"], np.float64),
                active.astype(np.float64),
            ) / max(1.0, np.abs(lam).max()))
        state, _ = step(state, tau)

    assert len(residuals) > 20, "rollout never made contact — test is vacuous"
    r = np.asarray(residuals)
    # per-task envelope (see the parametrize table comment): each
    # percentile bound is binding (ADVICE.md r3: the old p95 < 1e-3 was
    # dead code behind max < 1e-4).  The escalation path is what holds
    # the MAX, so it regressing fails this loudly.
    med_b, p95_b, max_b = bounds
    assert np.median(r) < med_b, f"median residual {np.median(r):.2e}"
    assert np.percentile(r, 95) < p95_b, \
        f"p95 residual {np.percentile(r, 95):.2e}"
    assert r.max() < max_b, f"max residual {r.max():.2e}"
