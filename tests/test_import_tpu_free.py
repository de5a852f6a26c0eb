"""Importing ssds_tpu must not initialize ANY jax backend.

Round-2 regression: a module-level ``jnp.float32(-1e30)`` in ``ops/nms.py``
materialized an array on the default (TPU) platform at import time, so
``__graft_entry__.dryrun_multichip`` — whose contract is "never touches the
real TPU backend" — died whenever the tunneled libtpu was unhealthy
(MULTICHIP_r01/r02 both red). This test imports the ENTIRE package in a
clean subprocess (no JAX_PLATFORMS=cpu forcing, axon plugin registered as
in production) and asserts zero backends got initialized, so any future
import-time jax-array constant fails CI regardless of TPU health.
"""

import os
import pkgutil
import subprocess
import sys

import ssds_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _all_modules():
    mods = ["ssds_tpu"]
    for m in pkgutil.walk_packages(ssds_tpu.__path__, prefix="ssds_tpu."):
        mods.append(m.name)
    # pallas kernels import jax.experimental.pallas, which itself must stay
    # lazy; include them so the sweep is total.
    return mods


CHECK = r"""
import sys
mods = {mods!r}
for m in mods:
    __import__(m)
from jax._src import xla_bridge
# jax._src.xla_bridge._backends is populated only when backends() runs,
# i.e. when something actually initialized a platform client.
inited = sorted(xla_bridge._backends)
assert not inited, f"importing ssds_tpu initialized backend(s): {{inited}}"
assert not xla_bridge.backends_are_initialized(), "backends initialized"
print("import-clean:", len(mods), "modules")
"""


def test_import_initializes_no_backend():
    env = dict(os.environ)
    # Run under PRODUCTION platform resolution: drop the conftest's CPU
    # forcing so that an import-time array would really target the default
    # (axon/TPU when registered) platform and trip the assertion.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    code = CHECK.format(mods=_all_modules())
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "import-clean:" in proc.stdout
