"""2-process CPU localhost smoke test for the multi-host wiring
(parallel/multihost.py; SURVEY.md §5.8). Spawns two subprocesses that join
one jax.distributed runtime over a shared mesh, exercise process_slice +
global_batch_from_local, and run one data-parallel R train step each —
asserting both processes compute the same loss."""
import os
import socket
import subprocess

import pytest

pytestmark = pytest.mark.slow  # spawns 2 jax.distributed processes + a full train-CLI run
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _communicate_all(procs, timeout):
    """communicate() every rank; on timeout/error KILL the rest — an
    orphaned jax.distributed rank would hold its port and a core on this
    1-core host and wedge everything after it."""
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs


def test_two_process_train_cli(tmp_path):
    """The real train CLI across 2 processes: --coordinator_address flags,
    host-local loading (process_slice), global batch assembly, multi-process
    mesh placement — one epoch on synthetic 8x8 data, both ranks exit 0 and
    rank 0 writes the checkpoint."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["GANREVERSER_PLATFORM"] = "cpu"
    save = str(tmp_path / "logs")
    args = ["--dataset", "synthetic", "--save", save, "--epochs", "1",
            "--N_epoch", "2", "--batchSize", "8", "--noiseDim", "8",
            "--saveFreq", "1", "--nopretraining", "--noplot",
            "--colorSpace", "y", "--height", "8", "--width", "8",
            "--mesh_data", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2"]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "ganreverser_tpu.cli.train"]
        + args + ["--process_id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = _communicate_all(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    assert "joined distributed runtime: process" in outs[0]
    assert os.path.isfile(os.path.join(save, "adversarial", "manifest.json"))


def test_two_process_tp_train_and_save(tmp_path):
    """Tensor parallelism ACROSS processes (--mesh_model 2 on a 2-process
    mesh): params span non-addressable devices, so checkpoint saving must
    gather-replicate collectively before rank 0 writes (regression: a
    direct device_get raised 'spans non-addressable devices')."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["GANREVERSER_PLATFORM"] = "cpu"
    save = str(tmp_path / "logs")
    args = ["--dataset", "synthetic", "--save", save, "--epochs", "1",
            "--N_epoch", "1", "--batchSize", "8", "--noiseDim", "8",
            "--saveFreq", "1", "--nopretraining", "--noplot",
            "--colorSpace", "y", "--height", "8", "--width", "8",
            "--mesh_data", "1", "--mesh_model", "2",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2"]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "ganreverser_tpu.cli.train"]
        + args + ["--process_id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = _communicate_all(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-3000:]}"
    assert os.path.isfile(os.path.join(save, "adversarial", "manifest.json"))
    # the written checkpoint holds FULL (gathered) parameter tensors
    import numpy as np
    with np.load(os.path.join(save, "adversarial", "arrays.npz")) as z:
        big = z["G/params/l0/kernel"]
    assert big.shape == (8, 512 * 2 * 2)


def test_two_process_distributed_fused_e2e():
    """The north-star distributed fused e2e program across a REAL process
    boundary (VERDICT r4 item 7): the embedding all-gather and the
    ppermute pixel ring run between two jax.distributed processes; each
    rank asserts its shard matches the single-device fused program."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), "e2e"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = _communicate_all(procs, 600)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    digests = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_E2E_OK"):
                _, pid, val = line.split()
                digests[int(pid)] = float(val)
    assert set(digests) == {0, 1}, outs


def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    # each worker pins CPU itself; scrub the 8-virtual-device test flag so
    # every process owns exactly one device (1 device x 2 processes)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in range(2)]
    outs = _communicate_all(procs, 300)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
    assert set(losses) == {0, 1}, outs
    assert losses[0] == losses[1], losses
