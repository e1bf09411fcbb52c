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
# ... and disable any REMOTE-COMPILE interception for the CPU suite: a
# remote compile service returns XLA:CPU AOT code built with the SERVICE
# host's vector features, which can SIGILL/segfault when loaded here
# (three in-suite crashes bisected to exactly this: cache-read
# deserialization twice, backend_compile_and_load once, all in the same
# compile-heavy test that passes standalone).  Local compilation is
# correct by construction for the local machine.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
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

# NO persistent compilation cache for the suite: this sandbox's XLA:CPU
# executables can be AOT-compiled by a remote compile service with the
# build host's vector features, and DESERIALIZING such an artifact on a
# host without them SIGILLs mid-test (observed twice in dantzig_solve,
# the second time from a cache freshly written this session — the crash
# is in compilation_cache.get_executable_and_time).  A single pytest
# process reuses in-memory compilations; the persistent cache only
# amortizes cross-process re-runs and is not worth the crash class.
# The bench/profiling scripts keep their cache (TPU executables run on
# the chip, not the host CPU).


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
