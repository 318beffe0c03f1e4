"""pytest plugin (loaded via addopts ``-p autoawq_tpu._testenv``) that moves
the test run onto a virtual 8-device CPU mesh.

This container registers the TPU (axon) PJRT backend for *every* Python
process at interpreter startup via sitecustomize, so JAX is already pinned to
the single tunneled TPU chip before any pytest code runs. Tests want 8 local
CPU devices instead (fast, deterministic, exercises sharding). The only way
out is to re-exec with a cleaned environment; doing it from this plugin —
imported during pytest's option preparse, before fd-level capture starts —
keeps stdout intact. Set RUN_TPU_TESTS=1 to run tests on the real TPU.
"""

import os
import sys

if (
    os.environ.get("RUN_TPU_TESTS", "0") != "1"
    and os.environ.get("_AUTOAWQ_TPU_REEXEC") != "1"
    and "jax" in sys.modules
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables sitecustomize TPU hookup
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["_AUTOAWQ_TPU_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
