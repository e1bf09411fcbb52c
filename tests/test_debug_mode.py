"""checkify debug mode (SURVEY.md §5.2, VERDICT.md r1 missing #5):
corrupted state produces a LOCATED error instead of silent NaN poisoning.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dartenv_tpu.engine.debug import make_checked_sim_step
from dartenv_tpu.engine.world import init_state
from dartenv_tpu.envs.hopper import make_hopper_task


@pytest.fixture(scope="module")
def hopper_model():
    return make_hopper_task(dtype=jnp.float64).model


def test_clean_rollout_no_error(hopper_model):
    checked = jax.jit(make_checked_sim_step(hopper_model))
    state = init_state(hopper_model)
    tau = jnp.zeros(hopper_model.n, dtype=jnp.float64)
    for _ in range(20):
        err, (state, _) = checked(state, tau)
        err.throw()          # no-op when clean
    assert bool(jnp.all(jnp.isfinite(state.q)))


def test_nan_state_is_located(hopper_model):
    checked = jax.jit(make_checked_sim_step(hopper_model))
    state = init_state(hopper_model)
    state = dataclasses.replace(
        state, q=state.q.at[2].set(jnp.nan))
    tau = jnp.zeros(hopper_model.n, dtype=jnp.float64)
    err, _ = checked(state, tau)
    with pytest.raises(Exception, match="non-finite q"):
        err.throw()


def test_nan_tau_is_located(hopper_model):
    checked = jax.jit(make_checked_sim_step(hopper_model))
    state = init_state(hopper_model)
    tau = jnp.full(hopper_model.n, jnp.inf, dtype=jnp.float64)
    err, _ = checked(state, tau)
    with pytest.raises(Exception, match="non-finite tau"):
        err.throw()


def test_contact_overflow_is_flagged():
    """Cap the hopper LCP at 1 contact slot and land it: the debug mode
    reports the overflow the production path only counts."""
    task = make_hopper_task(dtype=jnp.float64)
    model = task.model.replace(
        solver=dataclasses.replace(task.model.solver, contact_cap=1))
    checked = jax.jit(make_checked_sim_step(model))
    state = init_state(model)
    tau = jnp.zeros(model.n, dtype=jnp.float64)
    tripped = False
    for _ in range(400):                # fall to the ground (2-pt contact)
        err, (state, _) = checked(state, tau)
        if err.get() is not None:
            assert "contact_cap overflow" in err.get()
            tripped = True
            break
    assert tripped, "hopper landing never overflowed a cap of 1"
