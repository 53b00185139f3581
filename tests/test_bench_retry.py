"""Bench fault-tolerance: transient backend errors must not kill the
measurement (round-1 postmortem: the official BENCH_r01.json recorded a
crash from ONE transient FAILED_PRECONDITION read while the chip was
fine)."""

import json

import jax
import pytest

from deep_sfm_revisited_tpu.utils import retry


class _Transient(RuntimeError):
    pass


def test_is_transient_classification():
    assert retry.is_transient(
        RuntimeError("FAILED_PRECONDITION: TPU backend error")
    )
    assert retry.is_transient(RuntimeError("UNAVAILABLE: Socket closed"))
    # OOM and programming errors are not retryable
    assert not retry.is_transient(RuntimeError("RESOURCE_EXHAUSTED: OOM"))
    assert not retry.is_transient(ValueError("FAILED_PRECONDITION"))
    assert not retry.is_transient(TypeError("bad shape"))


def test_is_transient_transport_errors():
    # the remote-helper tunnel surfaces socket teardown as OS-level
    # exception types, not RuntimeError — those must retry too
    assert retry.is_transient(ConnectionResetError("Connection reset by peer"))
    assert retry.is_transient(BrokenPipeError(32, "Broken pipe"))
    assert retry.is_transient(TimeoutError("timed out"))
    assert retry.is_transient(OSError("[Errno 104] Connection reset by peer"))
    # non-I/O OSErrors without transient markers stay fatal
    assert not retry.is_transient(FileNotFoundError("missing.yaml"))


def test_retry_recovers_from_socket_error():
    calls = []

    def build_and_run():
        calls.append(1)
        if len(calls) < 2:
            raise ConnectionResetError("Connection reset by peer")
        return "ok"

    assert retry.run_with_backend_retry(
        build_and_run, attempts=3, backoff_s=0.0
    ) == "ok"
    assert len(calls) == 2


def test_retry_retries_transient_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise _Transient("FAILED_PRECONDITION: TPU backend error")
        return 42

    assert retry.run_with_backend_retry(
        flaky, attempts=3, backoff_s=0.0, reset_on_last=False
    ) == 42
    assert len(calls) == 3


def test_retry_raises_non_transient_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        retry.run_with_backend_retry(broken, attempts=3, backoff_s=0.0)
    assert len(calls) == 1


def test_retry_exhausts_attempts():
    calls = []

    def always():
        calls.append(1)
        raise _Transient("UNAVAILABLE: backend error")

    with pytest.raises(_Transient):
        retry.run_with_backend_retry(
            always, attempts=2, backoff_s=0.0, reset_on_last=False
        )
    assert len(calls) == 2


def test_bench_chaos_one_fake_backend_failure(monkeypatch, capsys):
    """bench.main still emits the JSON line after an injected transient
    failure on the first device read (VERDICT round-1 'done =' criterion)."""
    import bench

    state = {"fails": 1}
    real_read = bench._read_scalar

    def chaotic_read(x):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise jax.errors.JaxRuntimeError(
                "FAILED_PRECONDITION: TPU backend error (FailedPrecondition)"
            )
        return real_read(x)

    monkeypatch.setattr(bench, "_read_scalar", chaotic_read)
    line = bench.main(
        shape=(1, 128, 128),
        iters=2,
        warmup=1,
        cfg_overrides={
            "depth.nlabel": 8,
            "pose.num_hypotheses": 16,
            "pose.ransac_iter": 1,
            "pose.num_correspondences": 128,
            "pose.polish_iters": 2,
        },
        attempts=2,
    )
    out = json.loads(line)
    assert out["metric"] == "frame_pairs_per_sec"
    assert out["value"] > 0
    assert state["fails"] == 0  # the injected failure was consumed
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(printed) == out
