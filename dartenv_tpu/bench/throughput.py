"""Throughput benchmark: batched env-steps/s (SURVEY.md §6).

Primary tracked metric (BASELINE.json): env-steps/s/chip on batched
DartWalker2d.  One env-step = one control step (frame_skip physics substeps
inside).  The whole rollout (policy + B envs x T steps) is a single jitted
XLA program; timing excludes compilation.

Baseline note: the reference publishes NO numbers (BASELINE.md).  The
`vs_baseline` ratio is computed against the survey's anecdotal single-core
CPU estimate for the reference stack (~5,000 env-steps/s/core, SURVEY.md §6
"anecdotal reference speed", explicitly an estimate) until the reference
can be measured.
"""
from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp




def _machine_cache_dir(base: str) -> str:
    """Compile-cache dir salted with a host-CPU fingerprint.

    The persistent cache stores XLA:CPU AOT code compiled with the BUILD
    host's vector features; loading it on a host without them raises
    "machine type ... doesn't match" and can SIGILL mid-test (observed:
    segfaults in dantzig_solve from a cache written on an
    avx512-different machine).  Salting the directory per CPU-feature
    set keeps reuse within a machine and isolation across them."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                fp = "noflags"
    except OSError:
        fp = "nocpuinfo"
    return f"{base}_{fp}"


def enable_compile_cache():
    """Persistent compilation cache: the rollout programs are large and the
    dominant bench cost is XLA compilation (minutes on a remotely-compiled
    tunneled chip); with the cache warm, re-runs start stepping immediately.

    Called from main() (and the profiling scripts), NOT at import time, so
    importers of make_task don't silently redirect the process-wide cache
    (ADVICE.md round 2).
    """
    jax.config.update("jax_compilation_cache_dir",
                      _machine_cache_dir("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_CPU_STEPS_PER_S = 5000.0  # anecdotal estimate, see module docstring

_TASKS = {
    "cartpole": ("dartenv_tpu.envs.cart_pole", "make_cartpole_task"),
    "reacher": ("dartenv_tpu.envs.reacher", "make_reacher_task"),
    "hopper": ("dartenv_tpu.envs.hopper", "make_hopper_task"),
    "walker2d": ("dartenv_tpu.envs.walker2d", "make_walker2d_task"),
    "humanwalker": ("dartenv_tpu.envs.human_walker",
                    "make_humanwalker_task"),
    "reacher2d": ("dartenv_tpu.envs.reacher2d", "make_reacher2d_task"),
    "doublependulum": ("dartenv_tpu.envs.double_pendulum",
                       "make_double_pendulum_task"),
    "snake7link": ("dartenv_tpu.envs.snake_7link", "make_snake7link_task"),
    "walker3d": ("dartenv_tpu.envs.walker3d", "make_walker3d_task"),
    "dog": ("dartenv_tpu.envs.dog", "make_dog_task"),
}


def make_task(name: str, dtype=jnp.float32, lcp_solver=None):
    import importlib

    mod, fn = _TASKS[name]
    kw = {} if lcp_solver is None else dict(lcp_solver=lcp_solver)
    return getattr(importlib.import_module(mod), fn)(dtype=dtype, **kw)


def random_policy(task):
    hi = jnp.asarray(task.control_bounds[0], dtype=jnp.float32)
    lo = jnp.asarray(task.control_bounds[1], dtype=jnp.float32)

    def policy(params, obs, key):
        del params
        shape = obs.shape[:-1] + (task.action_size,)
        return jax.random.uniform(key, shape, obs.dtype, 0.0, 1.0) * (
            hi - lo
        ) + lo

    return policy


def bench_env(name: str = "walker2d", batch: int = 4096,
              horizon: int = 100, iters: int = 5,
              max_episode_steps: int = 1000, devices=None,
              profile_dir: Optional[str] = None, lcp_solver=None,
              warm_start: bool = True, solver_overrides=None):
    """Returns dict with env-steps/s and timing detail."""
    from dartenv_tpu.parallel.rollout import make_rollout
    from dartenv_tpu.parallel.sharding import (
        env_mesh, make_sharded_rollout, shard_env_batch,
    )
    from dartenv_tpu.parallel.vec_env import VecEnv

    task = make_task(name, lcp_solver=lcp_solver)
    if not warm_start:
        # cold-start LCP every substep (reference semantics; used by the
        # docs/BENCH.md regression bisect) — drops the lam carry entirely
        task.warm_start = False
    if solver_overrides:
        from dartenv_tpu.envs.base import with_solver
        task.model = with_solver(task.model, **solver_overrides)
    vec = VecEnv(task, num_envs=batch, max_episode_steps=max_episode_steps)
    policy = random_policy(task)

    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_dev > 1:
        mesh = env_mesh(devices)
        rollout = jax.jit(
            make_sharded_rollout(vec, policy, horizon, mesh)
        )
        state, _ = vec.reset(jax.random.PRNGKey(0))
        state = shard_env_batch(state, mesh)
    else:
        rollout = jax.jit(make_rollout(vec, policy, horizon))
        state, _ = vec.reset(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)

    # compile + warmup
    t0 = time.perf_counter()
    state, stats = rollout(None, state, key)
    jax.block_until_ready(stats.returns_sum)
    compile_s = time.perf_counter() - t0

    if profile_dir:
        # one profiled iteration; the engine's named scopes (dynamics /
        # collision / constraints / integrate) show up per-phase in
        # TensorBoard/XProf (SURVEY.md §5.1)
        with jax.profiler.trace(profile_dir):
            state, stats = rollout(None, state, key)
            jax.block_until_ready(stats.returns_sum)

    times = []
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        state, stats = rollout(None, state, key)
        jax.block_until_ready(stats.returns_sum)
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps = batch * horizon
    return {
        "env": name,
        "batch": batch,
        "horizon": horizon,
        "devices": n_dev,
        "env_steps_per_s": steps / best,
        "env_steps_per_s_per_chip": steps / best / n_dev,
        "substeps_per_s": steps * task.frame_skip / best,
        "compile_s": compile_s,
        "iter_times_s": times,
        "episodes_seen": float(stats.episodes),
        "mean_return": float(stats.mean_return()),
    }


def bench_dr(name: str = "walker2d", batch: int = 4096,
             substeps: int = 400, iters: int = 5,
             force_xla: bool = False):
    """Throughput of a DOMAIN-RANDOMIZED batch (VERDICT r4 order #2's
    measured row): per-env mass/friction/damping leaves, stepped as one
    jitted lax.scan over `substeps` physics substeps.

    force_xla=True ablates the kernel routing (the r1-r4 behavior, where
    a traced model leaf forfeited the fused kernels) for the comparison
    row.  Reported env-steps/s divides substeps by frame_skip so numbers
    are comparable to bench_env's control-step metric."""
    import numpy as np

    from dartenv_tpu.engine.world import init_state
    from dartenv_tpu.parallel.domain_rand import (
        make_randomized_sim_step, randomize_model,
    )

    task = make_task(name)
    model = task.model
    spec = {"mass": 0.3, "geom_friction": 0.3, "damping": 0.3}
    bmodel = randomize_model(model, jax.random.PRNGKey(0), spec, batch)
    if force_xla:
        # a None from make_dr_sim_step routes to the vmapped phase-wise
        # XLA fallback (domain_rand imports it from engine.world at call
        # time, so patch it there)
        import dartenv_tpu.engine.world as _w

        orig = _w.make_dr_sim_step
        _w.make_dr_sim_step = lambda *a, **k: None
        try:
            vstep = make_randomized_sim_step(model, list(spec))
        finally:
            _w.make_dr_sim_step = orig
    else:
        vstep = make_randomized_sim_step(model, list(spec))

    state0 = init_state(model, warm_start=task.warm_start)
    stateB = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state0)
    rng = np.random.default_rng(0)
    n = model.n
    tauB = jnp.asarray(rng.uniform(-1.0, 1.0, (batch, n)),
                       jnp.float32) * 50.0

    def roll(state):
        def body(s, _):
            s2, _ = vstep(bmodel, s, tauB)
            return s2, ()

        out, _ = jax.lax.scan(body, state, None, length=substeps)
        return out

    roll_j = jax.jit(roll)
    t0 = time.perf_counter()
    out = roll_j(stateB)
    jax.block_until_ready(out.q)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = roll_j(stateB)
        jax.block_until_ready(out.q)
        times.append(time.perf_counter() - t0)
    best = min(times)
    env_steps = batch * substeps / task.frame_skip
    return {
        "env": name, "batch": batch, "substeps": substeps,
        "dr_fields": sorted(spec), "kernel_path": not force_xla,
        "env_steps_per_s_per_chip": env_steps / best,
        "compile_s": compile_s, "iter_times_s": times,
    }


# the five BASELINE.md benchmark configs (env, batch); humanwalker's batch
# is smaller because 29 dofs x frame_skip 15 is ~10x the per-env work
# (env, batch, horizon): cartpole runs a 1000-step horizon — at ~170M
# env-steps/s a 100-step rollout is one ~5 ms device call and the
# tunneled chip's per-call latency jitter dominated (the old table row
# spanned +-34% across runs; at horizon 1000 repeats land within ~+-4%
# — VERDICT.md r3 weak #5/order #7)
BASELINE_CONFIGS = (("cartpole", 8192, 1000), ("reacher", 4096, 100),
                    ("hopper", 4096, 100), ("walker2d", 4096, 100),
                    ("humanwalker", 1024, 100))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--env", default="walker2d", choices=sorted(_TASKS))
    p.add_argument("--all", action="store_true",
                   help="run all five BASELINE.md configs sequentially and "
                        "print one JSON line each (docs/BENCH.md table)")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--horizon", type=int, default=None,
                   help="rollout length per timed call (default: 1000 "
                        "for cartpole, 100 otherwise)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of one iteration here")
    p.add_argument("--solver", default=None, choices=["pgs", "dantzig"],
                   help="override the task's LCP solver")
    p.add_argument("--cold", action="store_true",
                   help="disable LCP warm-starting (cold start every "
                        "substep; bisect/validation mode)")
    p.add_argument("--pgs_iters", type=int, default=None,
                   help="override the task's PGS iteration budget")
    p.add_argument("--escalate_frac", type=float, default=None,
                   help="override the task's exact-solver escalation "
                        "fraction (0 disables)")
    p.add_argument("--escalate_iters", type=int, default=None,
                   help="override the tier-1 escalation pivot budget")
    p.add_argument("--escalate_iters2", type=int, default=None,
                   help="tier-2 cold re-solve pivot budget (0 disables)")
    p.add_argument("--escalate_refine", type=int, default=None,
                   help="tier-1 refinement pivots (-1 = legacy formula)")
    p.add_argument("--escalate_kmax", type=int, default=None,
                   help="cap on the escalation batch K")
    p.add_argument("--escalate_ref64", type=int, default=None,
                   help="mixed-precision f64-residual refinement passes "
                        "for the escalated K batch (enables x64)")
    p.add_argument("--escalate_ref", type=int, default=None,
                   help="compensated double-float refinement passes "
                        "(production tier; no x64 needed)")
    p.add_argument("--dr", action="store_true",
                   help="bench a domain-randomized batch (per-env "
                        "mass/friction/damping) at the substep level")
    p.add_argument("--dr_xla", action="store_true",
                   help="with --dr: ablate the kernel routing (the "
                        "pre-r5 fallback path) for comparison")
    args = p.parse_args(argv)

    if args.escalate_ref64 is not None:
        # f64 arrays must exist for lcp/dantzig.refine_mixed; the kernels
        # stay f32 (pallas_dynamics._x64_safe_kernel)
        jax.config.update("jax_enable_x64", True)

    enable_compile_cache()
    overrides = {}
    if args.pgs_iters is not None:
        overrides["pgs_iters"] = args.pgs_iters
    if args.escalate_frac is not None:
        overrides["escalate_frac"] = args.escalate_frac
    if args.escalate_iters is not None:
        overrides["escalate_iters"] = args.escalate_iters
    if args.escalate_iters2 is not None:
        overrides["escalate_iters2"] = args.escalate_iters2
    if args.escalate_refine is not None:
        overrides["escalate_refine"] = args.escalate_refine
    if args.escalate_kmax is not None:
        overrides["escalate_kmax"] = args.escalate_kmax
    if args.escalate_ref64 is not None:
        overrides["escalate_ref64"] = args.escalate_ref64
    if args.escalate_ref is not None:
        overrides["escalate_ref"] = args.escalate_ref
    overrides = overrides or None

    if args.dr:
        r = bench_dr(args.env, args.batch, iters=args.iters,
                     force_xla=args.dr_xla)
        per_chip = r["env_steps_per_s_per_chip"]
        line = {
            "metric": f"env-steps/s/chip (DR Dart"
                      f"{args.env.capitalize()}, B={args.batch}, "
                      f"{'kernel' if r['kernel_path'] else 'xla'})",
            "value": round(per_chip, 1),
            "unit": "env-steps/s/chip",
            "vs_baseline": round(per_chip / REFERENCE_CPU_STEPS_PER_S, 2),
        }
        if args.verbose:
            print(json.dumps(r, indent=2))
        print(json.dumps(line))
        return line

    if args.all:
        lines = []
        for env, batch, horizon in BASELINE_CONFIGS:
            r = bench_env(env, batch, args.horizon or horizon, args.iters,
                          lcp_solver=args.solver,
                          warm_start=not args.cold,
                          solver_overrides=overrides)
            per_chip = r["env_steps_per_s_per_chip"]
            line = {
                "metric": f"env-steps/s/chip (batched Dart"
                          f"{env.capitalize()}, B={batch})",
                "value": round(per_chip, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(per_chip / REFERENCE_CPU_STEPS_PER_S,
                                     2),
            }
            print(json.dumps(line), flush=True)
            lines.append(line)
        return lines

    horizon = args.horizon or (1000 if args.env == "cartpole" else 100)
    r = bench_env(args.env, args.batch, horizon, args.iters,
                  profile_dir=args.profile_dir, lcp_solver=args.solver,
                  warm_start=not args.cold, solver_overrides=overrides)
    per_chip = r["env_steps_per_s_per_chip"]
    line = {
        "metric": f"env-steps/s/chip (batched Dart{args.env.capitalize()},"
                  f" B={args.batch})",
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_CPU_STEPS_PER_S, 2),
    }
    if args.verbose:
        print(json.dumps(r, indent=2))
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
