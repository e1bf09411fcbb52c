"""Trace-capture adapter round trip (VERDICT.md r3 order #9).

The bit-match-vs-reference harness is externally blocked (the reference
mount is empty — SURVEY.md provenance warning), so this proves the whole
comparator pipeline end-to-end TODAY: the capture script's stand-in
backend drives this repo's own gym facade substep-by-substep, writes the
npz schema, and `compare_traces` adjudicates both a matching and a
deliberately-divergent pair.  When the reference mounts, the ONLY change
is `--backend reference` — everything downstream is already exercised.
"""
import numpy as np
import pytest

from dartenv_tpu.validation.trace import Trace, compare_traces


def _capture(tmp_path, name, seed, steps=5):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "capture_reference_trace",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "capture_reference_trace.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / name)
    mod.main(["--env", "DartHopper-v1", "--seed", str(seed),
              "--steps", str(steps), "--out", out, "--backend", "self"])
    return out


def _load(path):
    d = np.load(path, allow_pickle=True)
    return Trace(q=d["q"], dq=d["dq"], lam=d["lam"]), d


def test_capture_comparator_round_trip(tmp_path):
    """Same env + seed captured twice -> byte-identical traces through the
    full script -> npz -> Trace -> compare_traces pipeline."""
    pa = _capture(tmp_path, "a.npz", seed=3)
    pb = _capture(tmp_path, "b.npz", seed=3)
    ta, da = _load(pa)
    tb, db = _load(pb)
    # schema sanity: substeps = steps * frame_skip, full contact records
    fs = int(str(da["meta"][3]))
    assert da["q"].shape[0] == 5 * fs
    assert da["contacts"].shape[1:] == (db["contacts"].shape[1], 10)
    rep = compare_traces(ta, tb, atol=0.0, rtol=0.0)
    assert rep["first_divergence"] == -1, rep
    assert rep["max_q_err"] == 0.0 and rep["max_dq_err"] == 0.0
    assert rep["contact_events_match"]
    # the hopper actually made contact during the rollout (non-vacuous)
    assert float(np.abs(da["lam"]).max()) > 0.0


def test_comparator_flags_divergence(tmp_path):
    """Different seeds -> different reset noise -> the comparator reports
    the mismatch with a first-divergence index (proves it can FAIL)."""
    ta, _ = _load(_capture(tmp_path, "a.npz", seed=0))
    tc, _ = _load(_capture(tmp_path, "c.npz", seed=1))
    rep = compare_traces(ta, tc)
    assert rep["first_divergence"] == 0      # reset noise differs at t=0
    assert rep["max_q_err"] > 0.0
