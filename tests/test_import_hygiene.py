"""Importing the package must NOT initialize the XLA backend.

``jax.distributed.initialize`` (multi-host bootstrap, parallel/mesh.py) must
run before anything touches a device; a module-level ``jnp`` constant
anywhere in the package would therefore break every pod launch that does the
natural ``import torch_random_walk_tpu`` first.  Regression guard for the
fix that enabled tests/test_multiprocess.py.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
import torch_random_walk_tpu
import torch_random_walk_tpu.parallel.mesh
import torch_random_walk_tpu.parallel.partition_v2
import torch_random_walk_tpu.models.node2vec
import jax._src.xla_bridge as xb
assert not xb._backends, f"package import initialized backends: {list(xb._backends)}"
print("IMPORT_CLEAN")
"""


def test_package_import_does_not_initialize_backend():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize registers TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", _PROBE], text=True,
                         capture_output=True, env=env, cwd=_REPO, timeout=120)
    assert out.returncode == 0 and "IMPORT_CLEAN" in out.stdout, (
        out.stdout + out.stderr)
