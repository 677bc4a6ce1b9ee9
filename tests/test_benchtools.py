"""Host-side benchmark tooling: the session digest generator.

summarize_session.py turns a tpu_session.sh run (per-leg logs + rc
ledger) into the markdown artifact RESULTS.md sections start from; a
parsing regression here silently loses hardware evidence, so pin its
three jobs: rc pairing (last rc wins, skip lines ignored), JSON metric
extraction, and failed-leg tail surfacing. No jax import — pure host.
"""
from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(tmp_logdir):
    spec = importlib.util.spec_from_file_location(
        "summarize_session",
        os.path.join(REPO, "benchmarks", "summarize_session.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.LOGDIR = str(tmp_logdir)
    return mod


def _run(mod, argv, capsys):
    rc = mod.main(argv)
    return rc, capsys.readouterr().out


def test_digest_parses_json_brackets_and_rc(tmp_path, capsys):
    (tmp_path / "tpu_tx_status.log").write_text(
        "rc=0 tag=bench\nrc=124 tag=matrix\nskip tag=bench (already ok)\n")
    (tmp_path / "tpu_tx_bench.log").write_text(
        "WARNING: Platform 'axon' is experimental\n"
        "[bench] R-invert: 72,086 img/s | cosine top-k: 102,895 qps (x)\n"
        '{"metric": "R-inversion images/sec", "value": 72086.1, '
        '"unit": "images/sec/chip", "vs_baseline": 11.5}\n')
    (tmp_path / "tpu_tx_matrix.log").write_text(
        '{"config": 1, "metric": "half", "value": 1.0, "unit": "img/s"}\n'
        "Traceback (most recent call last):\n  boom\n")
    mod = _load(tmp_path)
    rc, out = _run(mod, ["tx"], capsys)
    assert rc == 0
    assert "## bench — ok" in out
    assert "72,086 img/s" in out          # bracketed measurement surfaced
    assert "**72,086.1**" in out          # JSON metric formatted
    assert "vs_baseline=11.5" in out      # extra fields carried along
    assert "## matrix — **FAILED rc=124**" in out
    assert "Failed-leg tails" in out and "boom" in out


def test_digest_resume_ledger_last_rc_wins(tmp_path, capsys):
    # a wedged first attempt (rc=3 sentinel line + rc=124 leg) followed by
    # a resumed green run appends to the SAME status file; the digest must
    # report the final state, once per leg, in first-seen order
    (tmp_path / "tpu_tx_status.log").write_text(
        "rc=124 tag=ablate\nWEDGED at 10:00:00 — aborting (resume: same tag)\n"
        "rc=0 tag=ablate\n")
    (tmp_path / "tpu_tx_ablate.log").write_text(
        '{"metric": "r_step", "value": 2.0, "unit": "x"}\n')
    mod = _load(tmp_path)
    rc, out = _run(mod, ["tx"], capsys)
    assert rc == 0
    assert out.count("## ablate") == 1
    assert "## ablate — ok" in out
    assert "FAILED" not in out


def test_digest_running_leg_and_cli_evidence(tmp_path, capsys):
    # a leg with a log but no rc yet (session still running) + a CLI leg
    # whose only evidence is its final trainer line
    (tmp_path / "tpu_tx_status.log").write_text("rc=0 tag=e2e_train\n")
    (tmp_path / "tpu_tx_e2e_train.log").write_text(
        "<trainer> epoch 2\n<trainer> Last epoch reached.\n")
    (tmp_path / "tpu_tx_bench.log").write_text("[bench] warming up\n")
    mod = _load(tmp_path)
    rc, out = _run(mod, ["tx"], capsys)
    assert rc == 0
    assert "Last epoch reached." in out
    assert "## bench — RUNNING/NO-RC" in out


def test_digest_no_logs_is_an_error(tmp_path, capsys):
    mod = _load(tmp_path)
    rc, out = _run(mod, ["zz"], capsys)
    assert rc == 1 and "no logs" in out
