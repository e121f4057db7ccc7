"""Multi-process distributed backend test (SURVEY.md §2.4 row 23).

Spawns TWO local CPU processes (4 virtual devices each), joins them with
``jax.distributed`` through the production env bootstrap
(``core.mesh.maybe_initialize_distributed``), and runs one data-parallel
decoder-LM train step over the 8-device global mesh — the only §2.4 row
that single-process virtual-mesh tests cannot cover (VERDICT r2 #7).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

# every test here is a whole-CLI / multi-process end-to-end smoke
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step(tmp_path):
    """Train step + jitted GMM slow loop + sharded Orbax save/restore,
    all over a 2-process global mesh (see distributed_worker.py)."""
    port = _free_port()
    base = dict(os.environ)
    base["FORDE_TEST_CKPT_DIR"] = str(tmp_path / "ckpt")
    # fresh CPU-only processes (the axon plugin pins the TPU otherwise)
    base.pop("PALLAS_AXON_POOL_IPS", None)
    base["JAX_PLATFORMS"] = "cpu"
    flags = base.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    base["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    base["JAX_NUM_PROCESSES"] = "2"
    base["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, base.get("PYTHONPATH", "")) if p
    )

    procs = []
    for pid in range(2):
        env = dict(base, JAX_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    matches = [
        re.search(
            r"WORKER_OK loss=([\d.eE+-]+) imbalance=([\d.eE+-]+) "
            r"ckpt_roundtrip=exact", o,
        )
        for o in outs
    ]
    assert all(matches), outs
    # SPMD: both processes compute the same replicated global values
    assert float(matches[0].group(1)) == pytest.approx(
        float(matches[1].group(1)), abs=1e-6
    )
    assert float(matches[0].group(2)) == pytest.approx(
        float(matches[1].group(2)), abs=1e-6
    )
