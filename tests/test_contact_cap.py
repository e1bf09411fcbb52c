"""Active-set compaction (SolverConfig.contact_cap) semantics tests."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from dartenv_tpu.validation import capture_trace, compare_traces


def _model(asset, cap, dtype=jnp.float64):
    from dartenv_tpu.model.skel_parser import asset_path, parse_skel

    m = parse_skel(asset_path(asset), dtype=dtype).robot
    return m.replace(solver=dataclasses.replace(m.solver, contact_cap=cap))


def _first_overflow(trace, cap):
    """First substep where more than `cap` contact slots carry a normal
    impulse in the UNCAPPED solve (beyond it, capping may legitimately
    change the solution)."""
    lam_n = trace.lam[:, 0::3]  # normal rows of the contact block
    counts = (lam_n > 1e-12).sum(axis=1)
    over = np.nonzero(counts > cap)[0]
    return int(over[0]) if over.size else trace.q.shape[0]


def _truncate(t, T):
    import dataclasses as dc
    return dc.replace(t, q=t.q[:T], dq=t.dq[:T], lam=t.lam[:T])


def test_capped_matches_uncapped_hopper():
    """While <= cap slots are simultaneously active, the capped solve is
    EXACTLY the uncapped one, substep for substep, through landing +
    friction (sorted active-set gather preserves the PGS sweep order)."""
    m0 = _model("hopper_capsule.skel", 0)
    m4 = _model("hopper_capsule.skel", 4)
    tau = np.random.default_rng(3).uniform(-20, 20, (400, m0.n))
    q0 = np.asarray(m0.q_init)
    t0 = capture_trace(m0, q0, np.zeros(m0.n), tau)
    t4 = capture_trace(m4, q0, np.zeros(m4.n), tau)
    T = _first_overflow(t0, 4)
    assert T > 50  # landing happens within the comparable window
    rep = compare_traces(_truncate(t0, T), _truncate(t4, T),
                         atol=1e-10, rtol=1e-9)
    assert rep["first_divergence"] == -1, rep
    assert rep["contact_events_match"]


def test_capped_matches_uncapped_walker2d():
    m0 = _model("walker2d.skel", 0)
    m6 = _model("walker2d.skel", 6)
    tau = np.random.default_rng(4).uniform(-30, 30, (300, m0.n))
    q0 = np.asarray(m0.q_init)
    t0 = capture_trace(m0, q0, np.zeros(m0.n), tau)
    t6 = capture_trace(m6, q0, np.zeros(m6.n), tau)
    T = _first_overflow(t0, 6)
    assert T > 50
    rep = compare_traces(_truncate(t0, T), _truncate(t6, T),
                         atol=1e-10, rtol=1e-9)
    assert rep["first_divergence"] == -1, rep


def test_cap_keeps_active_slots_first():
    """With more active slots than the cap, the deepest/active ones are
    kept: ground penetration is still resolved (no fall-through)."""
    m2 = _model("walker2d.skel", 2)  # deliberately too small
    tau = np.zeros((2000, m2.n))
    q0 = np.asarray(m2.q_init)
    t = capture_trace(m2, q0, np.zeros(m2.n), tau)
    # passive walker collapses onto the ground but never tunnels through:
    # root height stays above the deepest plausible resting pose
    assert t.q[:, 1].min() > -2.0
    assert np.isfinite(t.q).all()
