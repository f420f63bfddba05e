"""Unit tests for the canary-floor sampler loop (tools/canary_floor.py).

The sampler is now load-bearing infrastructure: bench.py gates its
quiet-window decision on the recorded stream floor, the step-regime
canary's anchor is validated against the recorded fp32-step floor, and
the --on_quiet hook is the only path that captures quiet-chip artifacts
during contention plateaus. The chip-facing canaries are replaced with
deterministic fakes here; what's under test is the loop logic — floor
accumulation, resume merging, best-sample tracking, and the quiet-hook
trigger/cooldown."""

import json
import types

import pytest

import tools.canary_floor as cf


class _Done(BaseException):
    """Raised by a fake canary once its scripted samples run out.
    Deliberately NOT an Exception: the sampler's tunnel-drop handler
    catches Exception and retries forever, while a BaseException exits
    the loop cleanly for the test."""


class _FakeDevice:
    platform = "tpu"


def _patch_environment(monkeypatch, samples):
    """Route the sampler's imports to fakes: a 'tpu' jax, canary
    constructors yielding scripted sample sequences, and no sleeping.
    ``samples`` maps canary key → list of values returned per tick."""
    import benchmarks._common as common
    import craniofacialsd_vae_tpu.utils.runtime as runtime

    fake_jax = types.SimpleNamespace(devices=lambda: [_FakeDevice()])
    monkeypatch.setattr(runtime, "setup_jax", lambda **kw: fake_jax)

    def scripted(key):
        it = iter(samples[key])

        def fn():
            try:
                return next(it)
            except StopIteration:
                raise _Done

        return fn

    monkeypatch.setattr(common, "make_matmul_canary",
                        lambda rng: scripted("matmul_ms"))
    monkeypatch.setattr(common, "make_ell_gather_canary",
                        lambda rng, **kw: scripted("gather_ms"))
    monkeypatch.setattr(common, "make_stream_canary",
                        lambda rng: scripted("stream_ms"))
    monkeypatch.setattr(
        common, "make_flagship_step_timer",
        lambda rng, compute_dtype=None, **kw: scripted(
            "step_fp32_ms" if compute_dtype == "float32" else "step_ms"))
    monkeypatch.setattr(cf.time, "sleep", lambda s: None)


def _run(monkeypatch, tmp_path, samples, extra_args=()):
    _patch_environment(monkeypatch, samples)
    out = tmp_path / "floor.json"
    with pytest.raises(_Done):      # sample exhaustion ends the loop
        cf.main(["--hours", "1", "--interval", "0",
                 "--out", str(out), *extra_args])
    with open(out) as f:
        return json.load(f)


BASE = {"matmul_ms": [3.0, 2.5, 2.8], "gather_ms": [1.5, 1.45, 1.6],
        "stream_ms": [0.9, 0.85, 0.95]}


def test_floors_are_running_minima(monkeypatch, tmp_path):
    out = _run(monkeypatch, tmp_path, BASE)
    assert out["matmul_ms"] == 2.5
    assert out["gather_ms"] == 1.45
    assert out["stream_ms"] == 0.85
    assert out["n_samples"] == 3
    # the best-stream sample is the FULL concurrent sample at min stream
    assert out["best_stream_sample"]["stream_ms"] == 0.85
    assert out["best_stream_sample"]["matmul_ms"] == 2.5


def test_resume_merges_and_preserves_unsampled_floors(monkeypatch,
                                                      tmp_path):
    prev = {"matmul_ms": 2.2, "gather_ms": 9.9, "stream_ms": 0.7,
            "step_ms": 10.5, "n_samples": 7, "sampled_hours": 1.0,
            "best_stream_sample": {"stream_ms": 0.7}}
    (tmp_path / "floor.json").write_text(json.dumps(prev))
    out = _run(monkeypatch, tmp_path, BASE)
    # lower prior floors survive; higher ones are improved by new samples
    assert out["matmul_ms"] == 2.2
    assert out["gather_ms"] == 1.45
    assert out["stream_ms"] == 0.7
    # step_ms came from a --step session; resuming WITHOUT --step must
    # not drop it
    assert out["step_ms"] == 10.5
    assert out["n_samples"] == 7 + 3
    assert out["sampled_hours"] >= 1.0


def test_step_sampling_and_quiet_hook(monkeypatch, tmp_path):
    from benchmarks._common import FP32_STEP_QUIET_MS
    quiet = FP32_STEP_QUIET_MS * 1.05
    loud = FP32_STEP_QUIET_MS * 3.5
    samples = {"matmul_ms": [3.0, 2.5, 2.8], "gather_ms": [1.5, 1.5, 1.5],
               "stream_ms": [0.9, 0.9, 0.9],
               "step_ms": [19.0, 18.5, 18.8],
               "step_fp32_ms": [loud, quiet, quiet]}
    ran = []

    def fake_run(cmd, **kw):
        ran.append(cmd)
        return types.SimpleNamespace(returncode=0, stdout="ok", stderr="")

    monkeypatch.setattr(cf.subprocess, "run", fake_run)
    out = _run(monkeypatch, tmp_path, samples,
               extra_args=["--step", "--on_quiet", "echo hi",
                           "--on_quiet_cooldown_s", "9e9"])
    assert out["step_ms"] == 18.5
    assert out["step_fp32_ms"] == pytest.approx(quiet)
    assert out["best_step_sample"]["step_ms"] == 18.5
    # full concurrent canaries are recorded with the best step sample
    assert "matmul_ms" in out["best_step_sample"]
    # the hook fired exactly once: the first quiet sample triggered it,
    # the second quiet sample fell inside the cooldown
    assert ran == ["echo hi"]


def test_on_quiet_not_fired_by_infinite_first_floor(monkeypatch, tmp_path):
    """Fresh session (no prior floor json) during a contention plateau:
    the 'dramatically below observed floor' detector must not fire on the
    very first sample (everything is < 0.7 × inf), which would capture
    contention-degraded artifacts on a loud chip."""
    from benchmarks._common import FP32_STEP_QUIET_MS
    loud = FP32_STEP_QUIET_MS * 3.5
    samples = {"matmul_ms": [3.0, 2.5, 2.8], "gather_ms": [1.5, 1.5, 1.5],
               "stream_ms": [0.9, 0.9, 0.9],
               "step_ms": [19.0, 18.5, 18.8],
               "step_fp32_ms": [loud, loud * 1.01, loud * 0.99]}
    ran = []
    monkeypatch.setattr(
        cf.subprocess, "run",
        lambda cmd, **kw: ran.append(cmd) or types.SimpleNamespace(
            returncode=0, stdout="", stderr=""))
    _run(monkeypatch, tmp_path, samples,
         extra_args=["--step", "--on_quiet", "echo hi"])
    assert ran == []


def test_step_floor_rejects_contended_brackets(monkeypatch, tmp_path):
    """A slope-timed step sample taken while the generic canaries read
    far above their observed floors is an artifact (contention easing
    between the short/long scans deflates the slope) — it must not set
    the step floor, and must land in the rejected audit field."""
    samples = {"matmul_ms": [3.0, 2.9, 70.0], "gather_ms": [1.5, 1.5, 24.0],
               "stream_ms": [0.9, 0.9, 10.9],
               "step_ms": [19.0, 18.5, 12.0],       # 12.0 is the artifact
               "step_fp32_ms": [27.0, 26.5, 20.0]}
    out = _run(monkeypatch, tmp_path, samples, extra_args=["--step"])
    assert out["step_ms"] == 18.5
    assert out["step_fp32_ms"] == 26.5
    assert out["best_step_sample"]["step_ms"] == 18.5
    rej = out["best_step_sample_rejected"]
    assert rej["step_ms"] == 12.0
    assert rej["rejected_canary"] == "matmul_ms"


def test_step_floor_demoted_when_floors_drop(monkeypatch, tmp_path):
    """A step sample accepted early in a loud fresh session (nothing to
    compare its brackets against yet) is demoted once quieter windows
    reveal its brackets were contended — the floor is re-resolved against
    the CURRENT generic floors every tick."""
    samples = {"matmul_ms": [9.0, 3.0, 2.9], "gather_ms": [4.0, 1.5, 1.5],
               "stream_ms": [2.5, 0.9, 0.9],
               "step_ms": [11.0, 18.5, 18.8],       # 11.0 looked fine at #1
               "step_fp32_ms": [19.0, 26.5, 27.0]}
    out = _run(monkeypatch, tmp_path, samples, extra_args=["--step"])
    assert out["step_ms"] == 18.5
    assert out["best_step_sample_rejected"]["step_ms"] == 11.0


def test_revalidate_demotes_tainted_record(tmp_path):
    """--revalidate re-resolves a pre-round-5 record offline: a
    best_step_sample whose concurrent canaries exceed the sanity factor
    loses the floor to the best bracket-sane evidence on record."""
    prev = {"matmul_ms": 3.0, "gather_ms": 1.3, "stream_ms": 0.77,
            "step_ms": 15.6, "step_fp32_ms": 26.0, "n_samples": 299,
            "sampled_hours": 14.8,
            "best_stream_sample": {"matmul_ms": 4.3, "gather_ms": 1.4,
                                   "stream_ms": 0.77, "step_ms": 18.9,
                                   "step_fp32_ms": 26.9, "utc": "t1"},
            "best_step_sample": {"matmul_ms": 70.2, "gather_ms": 24.0,
                                 "stream_ms": 10.9, "step_ms": 15.6,
                                 "step_fp32_ms": 26.0, "utc": "t2"}}
    out_path = tmp_path / "floor.json"
    out_path.write_text(json.dumps(prev))
    cf.main(["--revalidate", "--out", str(out_path)])
    out = json.loads(out_path.read_text())
    assert out["step_ms"] == 18.9
    assert out["step_fp32_ms"] == 26.9
    assert out["best_step_sample"]["utc"] == "t1"
    assert out["best_step_sample_rejected"]["step_ms"] == 15.6
    # counters and generic floors survive the revalidation untouched
    assert out["n_samples"] == 299
    assert out["matmul_ms"] == 3.0


def test_on_quiet_requires_step(monkeypatch, tmp_path):
    with pytest.raises(SystemExit):
        cf.main(["--on_quiet", "echo hi", "--out",
                 str(tmp_path / "x.json")])


def test_refuses_non_tpu_platform(monkeypatch, tmp_path):
    import craniofacialsd_vae_tpu.utils.runtime as runtime

    class _CPU:
        platform = "cpu"

    fake_jax = types.SimpleNamespace(devices=lambda: [_CPU()])
    monkeypatch.setattr(runtime, "setup_jax", lambda **kw: fake_jax)
    with pytest.raises(SystemExit, match="not TPU"):
        cf.main(["--hours", "0.001", "--out", str(tmp_path / "x.json")])
