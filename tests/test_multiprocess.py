"""TRUE multi-process bootstrap (VERDICT r2 item 6).

Everything else in the suite simulates multi-chip with intra-process virtual
devices; this test launches TWO OS processes that rendezvous through
``jax.distributed.initialize`` (parallel/mesh.init_distributed), build one
global mesh, and run a cross-process data-parallel walk — exercising process
bootstrap, the DCN-path mesh construction, and cross-process determinism
(walks bit-identical to single-process).  This is the multi-HOST half of the
north star made executable on CPU (the reference has no distributed layer at
all — SURVEY.md §2.8).

Env-skippable via TRW_SKIP_MULTIPROCESS=1 (e.g. sandboxes without
localhost sockets).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_bootstrap_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("TRW_SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled by env")
def test_two_process_bootstrap_bit_identical():
    nprocs = 2
    port = _free_port()
    env = dict(os.environ)
    # The axon sitecustomize registers (and INITIALIZES) the TPU plugin at
    # interpreter start when this var is set — which breaks the
    # must-call-initialize-first contract of jax.distributed.  The workers
    # are CPU-only; drop it.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        # Two CPU devices per process -> a 4-device global mesh whose
        # 'data' axis spans the process boundary.
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=_REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO)
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n--- output ---\n{out}")
        assert f"MP_WORKER_OK {pid}" in out, out
