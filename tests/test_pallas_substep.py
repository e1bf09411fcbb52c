"""Fused substep kernel (engine/pallas_substep.py) vs the XLA path.

The kernel's scalar-block trace (_trace_substep) must reproduce the
ENTIRE substep pipeline — dynamics, halfspace collision, active-set
compaction, row assembly, A-build, warm-started PGS, residual, dq_plus,
warm-carry scatter — exactly.  Verified here against the production XLA
composition on contact-rich rollouts; at f64 the trace matches to
~1e-14 (machine precision), so the f32 bounds below are pure rounding /
conditioning headroom.  (Interpret-mode execution of this kernel is
impractical on CPU — its unrolled graph takes >15 min to compile — so
the wrapper's layout plumbing is validated on the live chip instead:
docs/BENCH.md round-4 notes, including the duplicate-gather
miscompilation the packed `esc` output exists to avoid.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.collision.narrowphase import collide
from dartenv_tpu.dynamics import batched
from dartenv_tpu.engine.constraints import assemble_lcp, build_layout
from dartenv_tpu.engine.pallas_substep import (
    _SubStatic, _trace_substep, make_substep_phase, substep_supported,
)
from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.envs.base import with_solver
from dartenv_tpu.lcp.pgs import pgs_solve


def _xla_substep(model, layout, q, dq, lam_prev, tau):
    """The production XLA composition, escalation off."""
    dt = float(model.dt)
    kin = batched.bkin(model, q, dq)
    ddq, M = batched.forward_dynamics(model, kin, q, dq, tau, dt, None)
    dq_star = dq + dt * ddq
    contacts = collide(model, kin.R_w, kin.p_w)
    A, b, lo, hi, act, mu, findex, MinvJt, sel = assemble_lcp(
        model, layout, kin.phi, M, q, dq, dq_star, contacts, dt)
    lam0 = (sel @ lam_prev if sel is not None else lam_prev) * act
    lam = pgs_solve(A, b, lo, hi, findex, mu, act,
                    iters=model.solver.pgs_iters,
                    omega=model.solver.pgs_omega, lam0=lam0)
    dq_plus = dq_star + MinvJt @ lam
    lam_full = sel.T @ lam if sel is not None else lam
    return dict(dq_star=dq_star, b=b, mu=mu, act=act, lam_c=lam,
                dq_plus=dq_plus, lam_full=lam_full, M=M.reshape(-1),
                con_depth=contacts.depth, con_active=contacts.active,
                con_pos=contacts.pos.reshape(-1))


_FIELDS = ("dq_star", "b", "mu", "act", "lam_c", "dq_plus", "lam_full",
           "M", "con_depth", "con_active", "con_pos")


def _run_rollout_check(env, torque, n_sub, tol):
    from dartenv_tpu.bench.throughput import make_task

    task = make_task(env, dtype=jnp.float32)
    model = with_solver(task.model, None, escalate_frac=0.0)
    assert substep_supported(model)
    st = _SubStatic(model)
    layout = st.layout
    step = jax.jit(make_sim_step(model))
    state = init_state(model, warm_start=True)
    rng = np.random.default_rng(0)
    tau = jnp.zeros(model.n, dtype=jnp.float32)
    worst = {}
    for k in range(n_sub):
        if k % task.frame_skip == 0:
            a = rng.uniform(-1.0, 1.0, model.n - 3)
            tau = jnp.zeros(model.n, jnp.float32).at[3:].set(
                jnp.asarray(a, jnp.float32) * torque)
        q, dq = state.q, state.dq
        lam_prev = state.lam
        ref = _xla_substep(model, layout, q, dq, lam_prev, tau)
        outs = _trace_substep(
            st, [q[i] for i in range(model.n)],
            [dq[i] for i in range(model.n)],
            [tau[i] for i in range(model.n)],
            [lam_prev[i] for i in range(layout.m)])
        for name in _FIELDS:
            got = np.asarray(jnp.stack(
                [jnp.asarray(v, jnp.float32) for v in outs[name]]),
                np.float64)
            r = np.asarray(ref[name], np.float64).reshape(-1)
            err = np.abs(got - r).max() / max(1.0, np.abs(r).max())
            worst[name] = max(worst.get(name, 0.0), err)
        state, _ = step(state, tau)
    for name, err in worst.items():
        # discrete fields must agree exactly; continuous fields inherit
        # the n x n solve's f32 conditioning (see test_pallas_dynamics)
        t = 0.0 if name in ("act", "con_active") else tol
        assert err <= t, f"{name}: rel err {err:.2e} > {t}"


def test_substep_trace_walker2d():
    _run_rollout_check("walker2d", 100.0, 40, 1e-4)


def test_substep_trace_hopper():
    _run_rollout_check("hopper", 200.0, 40, 1e-4)


def test_substep_trace_humanwalker():
    """29-dof FREE/EULER/UNIVERSAL humanoid with BOX feet (corner
    selection) and damping; tolerance reflects the n=29 solve's
    conditioning (f64 agreement is ~1e-14)."""
    _run_rollout_check("humanwalker", 100.0, 16, 2e-2)


@pytest.mark.parametrize("env,n_sub", [
    ("walker2d", 12),
    # the hard models (VERDICT r4 order #7): n=29 FREE/EULER/UNIVERSAL
    # humanoid with BOX feet, and the 21-dof quadruped — the f64
    # machine-precision equality pins "the f32 bounds are pure rounding,
    # not different math" for the worst-conditioned shipped topologies
    ("humanwalker", 6),
    ("dog", 6),
])
def test_substep_trace_f64_exact(env, n_sub):
    """At f64 the trace matches the XLA composition to machine precision
    — the strongest statement that every pipeline stage (compaction
    ranking included) is the same math."""
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        from dartenv_tpu.bench.throughput import make_task

        task = make_task(env, dtype=jnp.float64)
        model = with_solver(task.model, None, escalate_frac=0.0)
        st = _SubStatic(model)
        layout = st.layout
        step = jax.jit(make_sim_step(model))
        state = init_state(model, warm_start=True)
        rng = np.random.default_rng(1)
        for k in range(n_sub):
            tau = jnp.asarray(
                np.concatenate([np.zeros(3),
                                rng.uniform(-100, 100, model.n - 3)]),
                jnp.float64)
            q, dq, lam_prev = state.q, state.dq, state.lam
            ref = _xla_substep(model, layout, q, dq, lam_prev, tau)
            outs = _trace_substep(
                st, [q[i] for i in range(model.n)],
                [dq[i] for i in range(model.n)],
                [tau[i] for i in range(model.n)],
                [lam_prev[i] for i in range(layout.m)])
            for name in ("dq_plus", "lam_full", "M", "con_depth"):
                got = np.asarray(jnp.stack(
                    [jnp.asarray(v, jnp.float64) for v in outs[name]]))
                r = np.asarray(ref[name]).reshape(-1)
                err = np.abs(got - r).max() / max(1.0, np.abs(r).max())
                assert err < 1e-12, f"{name}: {err:.2e}"
            state, _ = step(state, tau)
    finally:
        # restore the ambient mode (conftest runs the suite in x64
        # validation mode — forcing False here broke later f64 tests)
        jax.config.update("jax_enable_x64", prev_x64)


def test_substep_phase_primal_matches_inline():
    """make_substep_phase's single-env primal is bit-identical to the
    inline XLA step (CPU semantics unchanged), and its vmapped CPU path
    matches vmap of the primal."""
    from dartenv_tpu.bench.throughput import make_task

    task = make_task("hopper", dtype=jnp.float32)
    model = task.model
    layout = build_layout(model)
    sub = make_substep_phase(model)
    assert sub is not None
    state = init_state(model, warm_start=True)
    rng = np.random.default_rng(2)
    tau = jnp.asarray(np.concatenate(
        [np.zeros(3), rng.uniform(-200, 200, model.n - 3)]), jnp.float32)
    step = jax.jit(make_sim_step(model))
    s1, c1 = step(state, tau)
    # jit both sides: XLA:CPU jit-vs-eager fusion reassociates f32 sums
    q_new, dq_plus, lam, contacts = jax.jit(sub)(
        state.q, state.dq, state.lam, tau)
    np.testing.assert_allclose(np.asarray(s1.q), np.asarray(q_new),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.dq), np.asarray(dq_plus),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.lam), np.asarray(lam),
                               rtol=1e-4, atol=1e-5)

    B = 3
    qb = jnp.broadcast_to(state.q, (B, model.n)) + jnp.asarray(
        rng.uniform(-0.01, 0.01, (B, model.n)), jnp.float32)
    dqb = jnp.zeros((B, model.n), jnp.float32)
    lamb = jnp.zeros((B, layout.m), jnp.float32)
    taub = jnp.broadcast_to(tau, (B, model.n))
    outs = jax.jit(jax.vmap(sub))(qb, dqb, lamb, taub)
    refs = jax.jit(jax.vmap(sub))(qb, dqb, lamb, taub)  # determinism
    for a, b in zip(jax.tree_util.tree_leaves(outs),
                    jax.tree_util.tree_leaves(refs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_substep_supported_scope():
    """Unsupported shapes fall back: servo rows, self pairs, and
    constraint-free models are excluded."""
    from dartenv_tpu.bench.throughput import make_task

    for env in ("walker2d", "hopper", "walker3d", "dog", "humanwalker",
                "snake7link"):
        assert substep_supported(make_task(env).model), env
    # reacher: limit rows only — still supported (no contact slots)
    assert substep_supported(make_task("reacher").model)
    # cartpole-class: no constraint rows at all -> dynamics kernel only
    from dartenv_tpu.model.builder import ModelBuilder, box_inertia
    from dartenv_tpu.model import skel_model as sm

    b = ModelBuilder(dt=0.002)
    b.add_body("b", None, sm.REVOLUTE, mass=1.0,
               inertia=box_inertia(1.0, (0.1, 0.1, 0.1)))
    assert not substep_supported(b.finalize(dtype=jnp.float32))


def test_escalation_driver_on_cpu():
    """escalate_batch — the TPU-only driver over the kernel's packed
    outputs — exercised on CPU with XLA-built outs: escalated envs must
    land on the exact solver's point (f64-adjudicated residual drop) and
    non-escalated envs must be untouched bit-for-bit.  This is the code
    path whose duplicate-gather miscompile round 4 debugged; the packed
    single-gather + delta-patch structure is what this pins."""
    import dataclasses

    from dartenv_tpu.bench.throughput import make_task
    from dartenv_tpu.engine.pallas_substep import (
        _esc_layout, escalate_batch,
    )
    from dartenv_tpu.lcp.dantzig import make_exact_solver
    from dartenv_tpu.lcp.hybrid import comp_residual

    task = make_task("hopper", dtype=jnp.float32)
    model = with_solver(task.model, None, escalate_frac=1.0 / 8,
                        escalate_tol=1e-7, pgs_iters=3)  # force offenders
    st = _SubStatic(model)
    layout = st.layout
    cfg = model.solver
    B = 16
    rng = np.random.default_rng(5)
    q0 = np.asarray(model.q_init)
    outs_fields = {k: [] for k in ("res", "esc", "dq_plus", "lam_full")}
    per_env = []
    for e in range(B):
        q = jnp.asarray(q0 + rng.uniform(-0.06, 0.06, model.n),
                        jnp.float32)
        q = q.at[1].add(-0.05)            # bias toward ground contact
        dq = jnp.asarray(rng.uniform(-1.5, 1.5, model.n), jnp.float32)
        tau = jnp.asarray(np.concatenate(
            [np.zeros(3), rng.uniform(-200, 200, model.n - 3)]),
            jnp.float32)
        lam_prev = jnp.zeros((layout.m,), jnp.float32)
        o = _trace_substep(
            st, [q[i] for i in range(model.n)],
            [dq[i] for i in range(model.n)],
            [tau[i] for i in range(model.n)],
            [lam_prev[i] for i in range(layout.m)])
        for k in outs_fields:
            outs_fields[k].append(jnp.stack(
                [jnp.asarray(v, jnp.float32) for v in o[k]]))
        per_env.append(o)
    outs = {k: jnp.stack(v) for k, v in outs_fields.items()}

    exact1 = make_exact_solver(st.findex_c, iters=cfg.escalate_iters,
                               polish_iters=3)
    dqp0, lamf0 = outs["dq_plus"], outs["lam_full"]
    dqp, lamf = escalate_batch(st, cfg, outs, dqp0, lamf0, exact1, None,
                               jnp.float32)

    res = np.asarray(outs["res"][:, 0])
    K = max(1, int(np.ceil(B * cfg.escalate_frac)))
    idx = np.argsort(-res)[:K]
    changed = np.abs(np.asarray(dqp) - np.asarray(dqp0)).max(1) > 0
    # only top-K envs may change; every other env is bit-identical
    assert set(np.nonzero(changed)[0]) <= set(idx)
    assert changed.any(), "no env escalated — test setup is vacuous"
    # escalated envs' patched impulses beat their PGS residual (f64)
    tab, _ = _esc_layout(st)
    for e in np.nonzero(changed)[0]:
        o = per_env[e]
        arr = lambda k: np.asarray(
            [float(v) for v in o[k]], np.float64)
        m_c, n = st.m_c, st.dyn.n
        Jc = arr("Jc").reshape(m_c, n)
        M = arr("M").reshape(n, n)
        A = Jc @ np.linalg.solve(M + 1e-10 * np.eye(n), Jc.T) \
            + cfg.cfm * np.eye(m_c)
        act = arr("act")
        A = A * act[:, None] * act[None, :] + np.diag(1 - act)
        # recover the patched compacted lam from the lam_full delta
        sel = arr("sel_slots").astype(int)
        lam_full_new = np.asarray(lamf[e], np.float64)
        lam_c_new = np.concatenate(
            [np.concatenate([lam_full_new[3 * s_: 3 * s_ + 3]
                             for s_ in sel]) if st.cap else np.zeros(0),
             lam_full_new[3 * st.ns:]])
        r_old = comp_residual(
            jnp.asarray(A), jnp.asarray(arr("b")),
            jnp.asarray(arr("lam_c")), jnp.asarray(arr("lo")),
            jnp.asarray(arr("hi")), st.findex_c, jnp.asarray(arr("mu")),
            jnp.asarray(act))
        r_new = comp_residual(
            jnp.asarray(A), jnp.asarray(arr("b")),
            jnp.asarray(lam_c_new), jnp.asarray(arr("lo")),
            jnp.asarray(arr("hi")), st.findex_c, jnp.asarray(arr("mu")),
            jnp.asarray(act))
        assert float(r_new) < float(r_old), (e, float(r_old),
                                             float(r_new))
        # dq patch is consistent with the patched impulses
        MinvJt = np.linalg.solve(M + 1e-10 * np.eye(n), Jc.T)
        dq_expect = arr("dq_star") + MinvJt @ lam_c_new
        np.testing.assert_allclose(np.asarray(dqp[e], np.float64),
                                   dq_expect, rtol=2e-4, atol=2e-4)
