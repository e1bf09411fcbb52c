"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is exercised
on a CPU mesh exactly as SURVEY.md §4 prescribes
(xla_force_host_platform_device_count).  The driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

# force CPU: the session may point JAX_PLATFORMS at a tunneled TPU ("axon"),
# which would make every tiny test op a network round-trip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms to the tunneled TPU; undo it
jax.config.update("jax_platforms", "cpu")

# float64 validation mode (SURVEY.md §7 float policy): tests validate the
# physics in f64; TPU production mode is f32 and has its own tolerance tests.
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the env step graphs are large (humanoid ~29
# dofs x 15 substeps) and dominate test wall-clock on recompiles


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


jax.config.update("jax_compilation_cache_dir",
                  _machine_cache_dir("/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make a missing native tier LOUD (VERDICT.md r2 weak #6): the
    strongest correctness evidence in the repo (tests/test_exact_solver.py,
    tests/test_native.py — JAX vs C++ golden cross-checks) silently skips
    without g++.  Set DARTENV_REQUIRE_NATIVE=1 to turn the skip into a
    hard failure (CI should)."""
    from dartenv_tpu import native

    if not native.available():
        msg = ("NATIVE TIER UNAVAILABLE: g++ golden cross-checks "
               "(test_native.py, test_exact_solver.py) were SKIPPED — "
               "the solver-equivalence evidence did not run.")
        if os.environ.get("DARTENV_REQUIRE_NATIVE"):
            terminalreporter.write_line(msg, red=True, bold=True)
            raise RuntimeError(msg)
        terminalreporter.write_line("WARNING: " + msg, yellow=True,
                                    bold=True)
