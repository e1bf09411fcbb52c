"""Interpret-mode CI for the fused-substep kernel's LAYOUT PLUMBING
(VERDICT r4 order #4 / weak #3).

The scalar-block trace is pinned elsewhere (test_pallas_substep.py); what
had zero coverage was the actual `pallas_call` wrapper — to_blocks /
from_blocks transposes, BlockSpecs, packed-esc slicing, and the
escalation driver running on REAL kernel output.  The shipped models'
unrolled graphs take >15 min to compile in interpret mode, so this file
uses a minimal 2-dof pendulum with one sphere-vs-halfspace pair and a
limit row (m_c = 4): the whole kernel compiles in seconds on CPU, and a
transpose/BlockSpec regression fails HERE instead of as silent physics
drift on the live chip.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.engine.pallas_substep import (
    _SubStatic, make_substep_phase, substep_supported, substep_pallas,
)
from dartenv_tpu.engine.world import init_state, make_sim_step
from dartenv_tpu.envs.base import with_solver
from dartenv_tpu.model import skel_model as sm
from dartenv_tpu.model.builder import ModelBuilder, box_inertia


def _tiny_model(**solver_kw):
    """2-dof planar double pendulum, sphere tip on a ground halfspace,
    limit row on the first dof — the smallest model that exercises every
    row family the kernel assembles (contact n/t1/t2 + limit)."""
    b = ModelBuilder(dt=0.002)
    b.add_body("link1", None, sm.REVOLUTE, axes=[(0, 0, 1)], mass=1.0,
               inertia=box_inertia(1.0, (0.05, 0.25, 0.05)),
               pj_pos=(0, 1.0, 0), cj_pos=(0, 0.25, 0),
               q_lower=-0.3, q_upper=0.3, damping=0.05)
    b.add_body("link2", "link1", sm.REVOLUTE, axes=[(0, 0, 1)], mass=0.5,
               inertia=box_inertia(0.5, (0.04, 0.2, 0.04)),
               pj_pos=(0, -0.25, 0), cj_pos=(0, 0.2, 0))
    b.add_geom("link2", sm.GEOM_SPHERE, (0.18,), pos=(0, -0.2, 0),
               friction=0.8)
    b.add_ground(offset=0.0, friction=0.9)
    model = b.finalize(dtype=jnp.float32)
    if solver_kw:
        model = with_solver(model, None, **solver_kw)
    return model


def _states(model, B, seed=0):
    rng = np.random.default_rng(seed)
    n = model.n
    # most envs near-vertical (sphere tip in ground contact, some past
    # the +-0.3 limit), last two swung far out (no contact, no limit)
    q = np.asarray(rng.uniform(-0.35, 0.35, (B, n)))
    q[-2:] = rng.uniform(0.8, 1.2, (2, n))
    q = jnp.asarray(q, jnp.float32)
    dq = jnp.asarray(rng.uniform(-2.0, 2.0, (B, n)), jnp.float32)
    tau = jnp.asarray(rng.uniform(-3.0, 3.0, (B, n)), jnp.float32)
    m = _SubStatic(model).layout.m
    lam = jnp.zeros((B, m), jnp.float32)
    return q, dq, tau, lam


def test_interpret_kernel_matches_xla(monkeypatch):
    """The full wrapper path (blocks round-trip + BlockSpecs + packed
    output slicing) in Pallas interpret mode vs the per-env XLA step."""
    model = _tiny_model(escalate_frac=0.0)
    assert substep_supported(model)
    sub = make_substep_phase(model, interpret=True)
    assert sub is not None
    B = 8
    q, dq, tau, lam = _states(model, B)
    # NO jit around the interpret path: jitting inlines the
    # interpreter's thousands of (8,128) ops into one XLA:CPU
    # compile (>100 s); eager vmap dispatches the custom_vmap
    # batch rule directly and runs in seconds
    q_new, dq_plus, lam_full, contacts = jax.vmap(sub)(q, dq, lam, tau)

    # reference: the inline XLA composition, kernels disabled
    monkeypatch.setenv("DARTENV_NO_SUBSTEP_KERNEL", "1")
    monkeypatch.setenv("DARTENV_NO_DYN_KERNEL", "1")
    step = jax.jit(make_sim_step(model))
    for e in range(B):
        st = dataclasses.replace(init_state(model, warm_start=True),
                                 q=q[e], dq=dq[e], lam=lam[e])
        st2, c_ref = step(st, tau[e])
        np.testing.assert_allclose(np.asarray(q_new[e]),
                                   np.asarray(st2.q),
                                   rtol=2e-4, atol=2e-5, err_msg=f"q e{e}")
        np.testing.assert_allclose(np.asarray(dq_plus[e]),
                                   np.asarray(st2.dq),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"dq e{e}")
        np.testing.assert_allclose(np.asarray(lam_full[e]),
                                   np.asarray(st2.lam),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"lam e{e}")
        # discrete contact state must agree exactly
        np.testing.assert_array_equal(np.asarray(contacts.active[e]),
                                      np.asarray(c_ref.active))
    # non-vacuity: contacts and impulses actually occurred
    assert float(jnp.sum(contacts.active)) > 0
    assert np.abs(np.asarray(lam_full)).max() > 0


def test_interpret_escalation_driver_on_kernel_outputs():
    """Escalation driver fed by REAL kernel output: the packed-esc
    slicing (offset table) against actual pallas_call buffers.  Every
    env is escalation-eligible (frac=1, tol tiny, starved PGS); the
    patched impulses must satisfy complementarity at least as well as
    the starved PGS point, verified from an independently assembled
    f64 LCP per env."""
    from dartenv_tpu.collision.narrowphase import collide
    from dartenv_tpu.dynamics import batched
    from dartenv_tpu.engine.constraints import assemble_lcp, build_layout
    from dartenv_tpu.lcp.hybrid import comp_residual

    model = _tiny_model(escalate_frac=1.0, escalate_tol=1e-9, pgs_iters=2)
    sub = make_substep_phase(model, interpret=True)
    assert sub is not None
    B = 8
    q, dq, tau, lam = _states(model, B, seed=3)
    # NO jit around the interpret path: jitting inlines the
    # interpreter's thousands of (8,128) ops into one XLA:CPU
    # compile (>100 s); eager vmap dispatches the custom_vmap
    # batch rule directly and runs in seconds
    q_new, dq_plus, lam_full, contacts = jax.vmap(sub)(q, dq, lam, tau)
    assert np.isfinite(np.asarray(dq_plus)).all()

    # starved-PGS baseline: same kernel, escalation off
    model0 = _tiny_model(escalate_frac=0.0, pgs_iters=2)
    sub0 = make_substep_phase(model0, interpret=True)
    _, _, lam0, _ = jax.vmap(sub0)(q, dq, lam, tau)
    assert np.abs(np.asarray(lam_full) - np.asarray(lam0)).max() > 0, \
        "escalation changed nothing — driver plumbing untested"

    layout = build_layout(model)
    dt = float(model.dt)
    improved = 0
    for e in range(B):
        kin = batched.bkin(model, q[e], dq[e])
        ddq, M = batched.forward_dynamics(model, kin, q[e], dq[e],
                                          tau[e], dt, None)
        dq_star = dq[e] + dt * ddq
        cons = collide(model, kin.R_w, kin.p_w)
        A, b, lo, hi, act, mu, findex, MinvJt, sel = assemble_lcp(
            model, layout, kin.phi, M, q[e], dq[e], dq_star, cons, dt)
        f64 = lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        r_esc = float(comp_residual(
            f64(A), f64(b), f64(lam_full[e]), f64(lo), f64(hi),
            findex, f64(mu), f64(act)))
        r_pgs = float(comp_residual(
            f64(A), f64(b), f64(lam0[e]), f64(lo), f64(hi),
            findex, f64(mu), f64(act)))
        assert r_esc <= r_pgs + 1e-6, (e, r_pgs, r_esc)
        if r_esc < r_pgs - 1e-9:
            improved += 1
    assert improved > 0, "no env improved — escalation path vacuous"


def test_interpret_block_roundtrip_nondivisible_batch():
    """B not divisible by the 1024-env tile: the pad/broadcast path and
    the [:B] slice of from_blocks."""
    model = _tiny_model(escalate_frac=0.0)
    st = _SubStatic(model)
    B = 5
    q, dq, tau, lam = _states(model, B, seed=7)
    outs = substep_pallas(model, q, dq, tau, lam, st=st, interpret=True)
    # padded envs are broadcast copies of env 0 — the real envs' outputs
    # must be independent of the pad content: permuting envs permutes
    # outputs exactly
    perm = np.asarray([3, 1, 4, 0, 2])
    outs_p = substep_pallas(model, q[perm], dq[perm], tau[perm],
                            lam[perm], st=st, interpret=True)
    for f in ("dq_plus", "lam_full", "res", "esc"):
        np.testing.assert_array_equal(np.asarray(outs[f])[perm],
                                      np.asarray(outs_p[f]), err_msg=f)


def test_interpret_dr_kernel_matches_xla():
    """Domain-randomized leaves as REAL kernel block inputs (VERDICT r4
    order #2): the dr wrapper plumbing (flatten -> to_blocks -> in_specs
    -> in-kernel lane substitution) is pinned by comparing the kernel's
    packed per-env operators (M, Jc, b, mu, act — direct functions of
    the DR leaves) against the scalar trace with the same per-env
    values.  A lane mix-up (wrong env's mass/friction/size) fails at
    O(0.1) here.  End-to-end DR parity is covered on the fast paths in
    test_dr_kernel.py (f64 trace == XLA replace) — repeating it in
    interpret mode costs minutes for no extra surface."""
    from dartenv_tpu.engine.pallas_substep import (
        _apply_dr_sub, _esc_layout, _trace_substep,
    )

    # pgs_iters=8: the un-folded DR trace is ~an order bigger than the
    # static one; keep the interpret-mode op count down
    model = _tiny_model(escalate_frac=0.0, pgs_iters=8)
    fields = ("mass", "geom_friction", "damping", "geom_size")
    B = 6
    q, dq, tau, lam = _states(model, B, seed=9)
    rng = np.random.default_rng(13)
    dr_vals = tuple(
        jnp.asarray(np.asarray(getattr(model, f))[None]
                    * rng.uniform(0.8, 1.2,
                                  (B,) + (1,) * np.asarray(
                                      getattr(model, f)).ndim),
                    jnp.float32)
        for f in fields)

    st = _SubStatic(model)
    outs = substep_pallas(model, q, dq, tau, lam, st=st, interpret=True,
                          dr_fields=fields, dr_vals=dr_vals)
    assert float(jnp.sum(outs["con_active"])) > 0
    tab, _ = _esc_layout(st)
    for e in range(B):
        dr_flat = {f: [v[e].reshape(-1)[i] for i in range(v[e].size)]
                   for f, v in zip(fields, dr_vals)}
        o = _trace_substep(
            _apply_dr_sub(st, dr_flat),
            [q[e, i] for i in range(model.n)],
            [dq[e, i] for i in range(model.n)],
            [tau[e, i] for i in range(model.n)],
            [lam[e, i] for i in range(st.layout.m)])
        esc_t = np.asarray([float(jnp.asarray(v)) for v in o["esc"]])
        esc_k = np.asarray(outs["esc"][e], np.float64)
        for name in ("b", "mu", "act", "M", "Jc", "lam_c"):
            s_, t_ = tab[name]
            err = np.abs(esc_t[s_:t_] - esc_k[s_:t_]).max()
            tol = 1e-4 if name != "lam_c" else 5e-3   # PGS f32 drift
            assert err < tol, (e, name, err)
        # dq_plus through the wrapper matches the per-env DR trace
        dq_t = np.asarray([float(jnp.asarray(v))
                           for v in o["dq_plus"]])
        np.testing.assert_allclose(np.asarray(outs["dq_plus"][e]),
                                   dq_t, rtol=5e-2, atol=5e-3)
