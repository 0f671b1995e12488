"""True multi-process distributed test: 2 ``jax.distributed`` CPU processes
(local coordinator on 127.0.0.1) run the REAL Trainer host loop over a
global 4-device mesh — fit, collective orbax save, resume — via
``tests/multiprocess_worker.py``. This is the coverage the virtual 8-device
single-process tests cannot give: non-addressable global arrays, collective
checkpointing, rank-guarded host IO (reference rank-zero guards at
``src/main.py:67-69``, ``diffusion_wrapper.py:492``)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_fit_save_resume(tmp_path):
    n = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # Each process creates its own virtual devices; the worker pins 2.
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(REPO / "tests" / "multiprocess_worker.py"),
                str(tmp_path), coordinator, str(n), str(pid),
            ],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid} OK" in out, out[-2000:]
    assert "is_main=True" in outputs[0]
    assert "is_main=False" in outputs[1]
