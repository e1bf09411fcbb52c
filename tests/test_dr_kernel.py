"""Domain randomization THROUGH the fused kernels (VERDICT r4 order #2).

Previously a traced model leaf made make_substep_phase return None, so a
DR batch fell to the phase-wise XLA path (slower AND, pre-round-5, less
precise).  Now DR leaves are explicit per-env runtime inputs of the
kernels; this file pins:

  * the scalar-block trace with substituted DR leaves == the XLA
    composition with a per-env model.replace (f64 -> machine precision);
  * engine/world.make_dr_sim_step routing (kernel-servable field sets
    accepted, layout fields rejected);
  * the new parallel/domain_rand wrapper == the forced legacy fallback.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.engine.pallas_substep import (
    DR_FIELDS_SUB, _SubStatic, _apply_dr_sub, _trace_substep,
)
from dartenv_tpu.engine.world import init_state, make_dr_sim_step
from dartenv_tpu.envs.base import with_solver

from test_pallas_substep import _xla_substep


def _flat_leaf(arr):
    return [jnp.asarray(float(v), jnp.float64)
            for v in np.asarray(arr, np.float64).reshape(-1)]


@pytest.mark.parametrize("env", ["walker2d", "hopper"])
def test_dr_trace_matches_xla_f64(env):
    """Per-env (mass, damping, geom_friction, geom_size, gravity)
    substituted into the kernel trace == the XLA composition on the
    correspondingly replaced model, at f64 machine precision."""
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        from dartenv_tpu.bench.throughput import make_task

        task = make_task(env, dtype=jnp.float64)
        model = with_solver(task.model, None, escalate_frac=0.0)
        st = _SubStatic(model)
        layout = st.layout
        rng = np.random.default_rng(11)
        for trial in range(3):
            scale = lambda a: np.asarray(a, np.float64) * \
                rng.uniform(0.7, 1.3, np.asarray(a).shape)
            leaves = dict(
                mass=scale(model.mass),
                damping=scale(model.damping),
                geom_friction=scale(model.geom_friction),
                geom_size=scale(model.geom_size),
                gravity=scale(model.gravity),
            )
            m2 = model.replace(**{k: jnp.asarray(v, jnp.float64)
                                  for k, v in leaves.items()})
            # state biased toward ground contact
            q = jnp.asarray(np.asarray(model.q_init, np.float64)
                            + rng.uniform(-0.05, 0.05, model.n))
            q = q.at[1].add(-0.04)
            dq = jnp.asarray(rng.uniform(-1.0, 1.0, model.n))
            tau = jnp.asarray(np.concatenate(
                [np.zeros(3), rng.uniform(-100, 100, model.n - 3)]))
            lam_prev = jnp.zeros((layout.m,), jnp.float64)

            ref = _xla_substep(m2, layout, q, dq, lam_prev, tau)
            st_dr = _apply_dr_sub(st, {k: _flat_leaf(v)
                                       for k, v in leaves.items()})
            outs = _trace_substep(
                st_dr, [q[i] for i in range(model.n)],
                [dq[i] for i in range(model.n)],
                [tau[i] for i in range(model.n)],
                [lam_prev[i] for i in range(layout.m)])
            for name in ("dq_plus", "lam_full", "M", "con_depth", "b",
                         "mu"):
                got = np.asarray(jnp.stack(
                    [jnp.asarray(v, jnp.float64) for v in outs[name]]))
                r = np.asarray(ref[name]).reshape(-1)
                err = np.abs(got - r).max() / max(1.0, np.abs(r).max())
                assert err < 1e-12, f"trial {trial} {name}: {err:.2e}"
            # the DR values actually matter: the unmodified trace differs
            outs0 = _trace_substep(
                st, [q[i] for i in range(model.n)],
                [dq[i] for i in range(model.n)],
                [tau[i] for i in range(model.n)],
                [lam_prev[i] for i in range(layout.m)])
            d0 = np.asarray(jnp.stack([jnp.asarray(v, jnp.float64)
                                       for v in outs0["dq_plus"]]))
            dd = np.asarray(jnp.stack([jnp.asarray(v, jnp.float64)
                                       for v in outs["dq_plus"]]))
            assert np.abs(d0 - dd).max() > 1e-8, "DR substitution vacuous"
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def test_make_dr_sim_step_routing():
    from dartenv_tpu.bench.throughput import make_task

    model = make_task("walker2d", dtype=jnp.float32).model
    # every kernel-servable field set accepted
    assert make_dr_sim_step(model, ("mass", "geom_friction")) is not None
    assert make_dr_sim_step(model, DR_FIELDS_SUB) is not None
    # non-servable / layout fields rejected -> None (fallback path)
    assert make_dr_sim_step(model, ("mass", "axes")) is None
    assert make_dr_sim_step(model, ("ancestor_mask",)) is None


def test_randomized_wrapper_matches_forced_fallback(monkeypatch):
    """parallel/domain_rand's kernel-aware wrapper == the legacy vmapped
    XLA fallback, on a contact model with randomized mass+friction."""
    from dartenv_tpu.bench.throughput import make_task
    from dartenv_tpu.parallel.domain_rand import (
        make_randomized_sim_step, randomize_model,
    )

    model = make_task("hopper", dtype=jnp.float32).model
    fields = ["mass", "geom_friction", "damping"]
    B = 4
    bmodel = randomize_model(model, jax.random.PRNGKey(2),
                             {f: 0.3 for f in fields}, B)
    s0 = init_state(model, warm_start=True)
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    btau = jnp.asarray(
        np.random.default_rng(3).uniform(-200, 200, (B, model.n)),
        jnp.float32).at[:, :3].set(0.0)

    new = jax.jit(make_randomized_sim_step(model, fields))
    monkeypatch.setenv("DARTENV_NO_SUBSTEP_KERNEL", "1")
    old = jax.jit(make_randomized_sim_step(model, fields))
    monkeypatch.delenv("DARTENV_NO_SUBSTEP_KERNEL")

    bs_n, bs_o = bstate, bstate
    for _ in range(10):
        bs_n, _ = new(bmodel, bs_n, btau)
        bs_o, _ = old(bmodel, bs_o, btau)
    np.testing.assert_allclose(np.asarray(bs_n.q), np.asarray(bs_o.q),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bs_n.dq), np.asarray(bs_o.dq),
                               rtol=1e-3, atol=1e-4)
    # randomization spread is real
    assert float(jnp.std(bs_n.q[:, 1])) > 1e-6


def test_bench_dr_smoke_both_paths():
    """bench.py --dr's harness runs on CPU for both routings and the
    two paths step the same physics (the throughput row's kernel/xla
    comparison is apples-to-apples)."""
    from dartenv_tpu.bench.throughput import bench_dr

    r_k = bench_dr("hopper", batch=8, substeps=4, iters=1)
    r_x = bench_dr("hopper", batch=8, substeps=4, iters=1,
                   force_xla=True)
    assert r_k["kernel_path"] and not r_x["kernel_path"]
    assert r_k["env_steps_per_s_per_chip"] > 0
    assert r_x["env_steps_per_s_per_chip"] > 0
