"""Failure recovery as an end-to-end FLOW: restart-all, restore, continue.

The reference's only recovery primitives are `state_vector()` /
`set_state_vector()` and Monitor's crash-resilient atomic writes
(SURVEY.md §5.3/§5.4).  The rebuild's recovery model is JAX's standard
"restart all processes, restore the checkpoint": `SimState`/`EnvState`
pytrees (including RNG keys) are checkpointed periodically; after a
failure every process restarts, restores the same checkpoint onto the
mesh, and the rollout continues bit-identically.

tests/test_checkpoint.py proves save/load round-trips inside one process;
this test proves the actual FLOW across a process boundary — the part
VERDICT.md r1 flagged as never exercised: process A runs a sharded
8-device rollout, checkpoints mid-flight, and records its continuation as
ground truth; then a brand-new process B ("the restarted job") rebuilds
the mesh from scratch, restores the checkpoint, continues, and must
reproduce A's post-checkpoint trajectory bit-for-bit.
"""
import os
import re
import subprocess
import sys

import numpy as np

_PRE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from dartenv_tpu.envs.hopper import make_hopper_task
from dartenv_tpu.parallel.sharding import env_mesh, shard_env_batch
from dartenv_tpu.parallel.vec_env import VecEnv
from dartenv_tpu.utils import checkpoint as ckpt

task = make_hopper_task(dtype=jnp.float64)
vec = VecEnv(task, num_envs=16, max_episode_steps=50)
mesh = env_mesh()
assert len(mesh.devices.ravel()) == 8
step = jax.jit(vec.step)
acts = jnp.zeros((16, task.action_size), dtype=jnp.float64)

def run(state, n):
    traj = []
    for _ in range(n):
        state, obs, r, d, _ = step(state, acts)
        traj.append(np.asarray(obs))
    return state, np.stack(traj)
"""

_PROC_A = _PRE + r"""
state, _ = vec.reset(jax.random.PRNGKey(7))
state = shard_env_batch(state, mesh)
state, _ = run(state, 6)                       # pre-failure work
ckpt.save_pytree(sys_path + "/ckpt", state)    # periodic checkpoint
_, golden = run(state, 8)                      # uninterrupted continuation
np.save(sys_path + "/golden.npy", golden)
print("A-DONE")
""".replace("sys_path", "SYS_PATH")

_PROC_B = _PRE + r"""
# the "restarted job": no live state — only the checkpoint on disk.
# Rebuild the template pytree from the same env construction, restore,
# and re-shard onto the (fresh) mesh.
template, _ = vec.reset(jax.random.PRNGKey(0))  # shapes/dtypes only
state = ckpt.load_pytree(sys_path + "/ckpt", template)
state = shard_env_batch(state, mesh)
_, resumed = run(state, 8)
np.save(sys_path + "/resumed.npy", resumed)
print("B-DONE")
""".replace("sys_path", "SYS_PATH")


def _run_child(tmp_path, name, code):
    code = "import sys\nSYS_PATH = " + repr(str(tmp_path)) + "\n" + code
    script = os.path.join(tmp_path, name + ".py")
    with open(script, "w") as f:
        f.write(code)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_restart_all_restore_flow(tmp_path):
    out_a = _run_child(str(tmp_path), "proc_a", _PROC_A)
    assert "A-DONE" in out_a
    out_b = _run_child(str(tmp_path), "proc_b", _PROC_B)
    assert "B-DONE" in out_b
    golden = np.load(os.path.join(str(tmp_path), "golden.npy"))
    resumed = np.load(os.path.join(str(tmp_path), "resumed.npy"))
    # bit-identical continuation across the restart boundary
    np.testing.assert_array_equal(resumed, golden)
