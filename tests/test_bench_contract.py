"""bench.py JSON contract: one parseable record on success AND on every
failure class (round-3 lesson: the 720p OOM died with a raw traceback and
no JSON, so the driver-recorded BENCH had no 720p number at all).

Runs bench.py as a subprocess on CPU at the tiny contract geometry; the
fault-injection hook (DEMFI_BENCH_FAIL_INJECT) exercises the failure
paths without a TPU."""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "bench.py")


def _run(extra_env, timeout=900):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update({"DEMFI_BENCH_TINY": "1", "JAX_PLATFORMS": ""})
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, BENCH, "--cpu", "--no_probe"],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT, env=env)
    lines = [l for l in r.stdout.strip().splitlines()
             if l.startswith("{")]
    assert lines, (f"no JSON line emitted\nstdout: {r.stdout}\n"
                   f"stderr: {r.stderr[-2000:]}")
    return json.loads(lines[-1]), r


def test_bench_success_record():
    rec, _ = _run({})
    assert rec["unit"] == "frames/s"
    assert rec["value"] > 0
    assert "error" not in rec
    assert "CPU-FALLBACK" in rec["metric"]


def test_bench_oom_injection_emits_json_and_retries_t_map():
    rec, _ = _run({"DEMFI_BENCH_FAIL_INJECT": "oom"})
    assert rec["value"] == 0.0
    assert rec["error_kind"] == "oom"
    assert "RESOURCE_EXHAUSTED" in rec["error"]
    # the first OOM must retry with the minimal-footprint t_map shape,
    # NOT a DEMFI_NO_PALLAS re-run of the identical program
    assert rec.get("retries") == ["oom->t_map"]


def test_bench_nonfinite_checksum_is_a_failure_record():
    rec, _ = _run({"DEMFI_BENCH_FAIL_INJECT": "nan"})
    assert rec["value"] == 0.0
    assert rec["error_kind"] == "nonfinite-checksum"


def test_bench_generic_exception_emits_json():
    rec, _ = _run({"DEMFI_BENCH_FAIL_INJECT": "generic"})
    assert rec["value"] == 0.0
    assert "injected generic failure" in rec["error"]


@pytest.mark.parametrize("t_chunk,marker", [
    (1, "t_map"),
    (3, "t_chunk=3"),
])
def test_bench_chunk_shapes_run_and_label(t_chunk, marker):
    """Both memory-bounded execution shapes (sequential lax.map and
    engine-style separate-call chunks) produce a real number and say so
    in the metric string."""
    env = {"DEMFI_BENCH_TINY": "1"}
    r = subprocess.run(
        [sys.executable, BENCH, "--cpu", "--no_probe",
         "--t_chunk", str(t_chunk)],
        capture_output=True, text=True, timeout=900, cwd=ROOT,
        env={**os.environ, **env, "JAX_PLATFORMS": ""})
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON: {r.stdout}\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["value"] > 0, rec
    assert marker in rec["metric"]
