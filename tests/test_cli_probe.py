"""Fail-fast backend probe for production CLIs (cli/common.py).

A wedged tunnel plugin blocks the first device op forever (three observed
modes — bench.py::_resolve_backend docstring); CLIs must exit with an
actionable message instead of hanging past any user budget. The probe is
a killable subprocess; these tests exercise its decision logic with the
subprocess mocked (the real probe is exercised by the TPU session's e2e
legs, which run the CLIs on the live tunnel with no platform pin).
"""
from __future__ import annotations

import subprocess
import types

import pytest

from ganreverser_tpu.cli import common


def test_probe_skipped_when_platform_pinned(monkeypatch):
    monkeypatch.setenv("GANREVERSER_PLATFORM", "cpu")
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: pytest.fail("probe must not run"))
    common.ensure_backend_alive()


def test_probe_skipped_when_opted_out(monkeypatch):
    monkeypatch.delenv("GANREVERSER_PLATFORM", raising=False)
    monkeypatch.setenv("GANREVERSER_SKIP_PROBE", "1")
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: pytest.fail("probe must not run"))
    common.ensure_backend_alive()


def test_probe_skipped_under_multiprocess(monkeypatch):
    monkeypatch.delenv("GANREVERSER_PLATFORM", raising=False)
    monkeypatch.delenv("GANREVERSER_SKIP_PROBE", raising=False)
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: pytest.fail("probe must not run"))
    cfg = types.SimpleNamespace(coordinator_address="localhost:9876")
    common.ensure_backend_alive(cfg)


def test_probe_healthy_returns(monkeypatch):
    monkeypatch.delenv("GANREVERSER_PLATFORM", raising=False)
    monkeypatch.delenv("GANREVERSER_SKIP_PROBE", raising=False)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: types.SimpleNamespace(
        returncode=0, stdout="OK 128.0\n", stderr=""))
    common.ensure_backend_alive()


def test_probe_wedge_exits_with_guidance(monkeypatch):
    monkeypatch.delenv("GANREVERSER_PLATFORM", raising=False)
    monkeypatch.delenv("GANREVERSER_SKIP_PROBE", raising=False)

    def _timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", _timeout)
    with pytest.raises(SystemExit) as ei:
        common.ensure_backend_alive(timeout_s=7)
    msg = str(ei.value)
    assert "wedged > 7s" in msg and "GANREVERSER_PLATFORM=cpu" in msg


def test_probe_dead_plugin_exits(monkeypatch):
    monkeypatch.delenv("GANREVERSER_PLATFORM", raising=False)
    monkeypatch.delenv("GANREVERSER_SKIP_PROBE", raising=False)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: types.SimpleNamespace(
        returncode=1, stdout="", stderr="RuntimeError: no devices"))
    with pytest.raises(SystemExit) as ei:
        common.ensure_backend_alive()
    assert "no devices" in str(ei.value)
