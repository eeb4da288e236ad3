"""Wedged-tunnel guard (utils/platform_guard.py).

The guard protects the driver's unattended entry points (bench.py,
bench_suite.py, __graft_entry__.entry) from the axon tunnel failure mode
where backend init blocks forever: probe in a subprocess, pin CPU on hang.
"""

import subprocess
import sys

import jax
import pytest

from nerve_tpu.utils import platform_guard


def _reset():
    platform_guard._checked = None


@pytest.fixture
def tunnel_platforms():
    """Temporarily restore the site-default platform list so the guard's
    probe path runs (conftest pins "cpu", which short-circuits it)."""
    before = jax.config.jax_platforms
    jax.config.update("jax_platforms", "axon,cpu")
    try:
        yield
    finally:
        jax.config.update("jax_platforms", before if before else "cpu")


def test_pinned_platforms_skip_probe(monkeypatch):
    """Under conftest's cpu pin the guard must not spawn a probe at all —
    the decision is already made (and entry() under pytest must be fast)."""
    _reset()

    def boom(*a, **k):
        raise AssertionError("probe subprocess must not run when pinned")

    monkeypatch.setattr(platform_guard.subprocess, "run", boom)
    assert jax.config.jax_platforms == "cpu"  # conftest pinned
    assert platform_guard.guard_against_wedged_tunnel() is False


def test_healthy_backend_returns_true(monkeypatch, tunnel_platforms):
    _reset()
    # A real-subprocess probe is NOT hermetic here: the axon TPU plugin
    # ignores the inherited JAX_PLATFORMS=cpu env (see conftest.py), so the
    # probe would exercise the actual tunnel. Simulate a healthy probe; the
    # guard must not pin anything or report a fallback.
    def ok(*a, **k):
        return subprocess.CompletedProcess(a[0], returncode=0, stdout="tpu\n",
                                           stderr="")

    monkeypatch.setattr(platform_guard.subprocess, "run", ok)
    before = jax.config.jax_platforms
    assert platform_guard.guard_against_wedged_tunnel(timeout_s=5.0) is True
    assert jax.config.jax_platforms == before


def test_hung_probe_pins_cpu(monkeypatch, tunnel_platforms):
    _reset()

    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 0))

    monkeypatch.setattr(platform_guard.subprocess, "run", hang)
    assert platform_guard.guard_against_wedged_tunnel(timeout_s=0.1) is False
    assert jax.config.jax_platforms == "cpu"


def test_failed_probe_pins_cpu(monkeypatch, tunnel_platforms):
    _reset()

    def fail(*a, **k):
        return subprocess.CompletedProcess(
            a[0], returncode=1, stdout="", stderr="RuntimeError: no device"
        )

    monkeypatch.setattr(platform_guard.subprocess, "run", fail)
    assert platform_guard.guard_against_wedged_tunnel(timeout_s=0.1) is False
    assert jax.config.jax_platforms == "cpu"


def test_idempotent_after_first_check(monkeypatch, tunnel_platforms):
    _reset()
    calls = []

    def ok(*a, **k):
        calls.append(1)
        return subprocess.CompletedProcess(a[0], returncode=0, stdout="cpu\n",
                                           stderr="")

    monkeypatch.setattr(platform_guard.subprocess, "run", ok)
    platform_guard.guard_against_wedged_tunnel()
    platform_guard.guard_against_wedged_tunnel()
    assert len(calls) == 1


def test_cached_result_preserved_after_fallback(monkeypatch, tunnel_platforms):
    _reset()

    def fail(*a, **k):
        return subprocess.CompletedProcess(
            a[0], returncode=1, stdout="", stderr="RuntimeError: no device"
        )

    monkeypatch.setattr(platform_guard.subprocess, "run", fail)
    assert platform_guard.guard_against_wedged_tunnel(timeout_s=0.1) is False
    # A second caller in the same process must still learn the backend is
    # pinned to CPU, not get a spurious "healthy" True.
    assert platform_guard.guard_against_wedged_tunnel(timeout_s=0.1) is False
