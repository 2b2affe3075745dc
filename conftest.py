"""Root conftest: re-exec the test process onto the CPU JAX backend.

The container's sitecustomize registers an 'axon' remote-TPU PJRT plugin at
interpreter startup (when PALLAS_AXON_POOL_IPS is set) and force-overrides
``jax_platforms`` — too early for any in-process fix. So once pytest has
configured (and we can restore its fd capture), re-exec the whole process
with a pure-CPU JAX environment and an 8-device virtual mesh for sharding
tests (the driver's separate ``dryrun_multichip`` exercises the same meshes).
"""

import os
import sys


def _needs_cpu_reexec() -> bool:
    if os.environ.get("PMPC_TPU_TESTS_REEXEC") == "1":
        return False
    return (
        os.environ.get("JAX_PLATFORMS", "") != "cpu"
        or os.environ.get("PALLAS_AXON_POOL_IPS") is not None
    )


def pytest_configure(config):
    if not _needs_cpu_reexec():
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)  # restore real stdout/stderr fds
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PMPC_TPU_TESTS_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # stop sitecustomize registering axon
    # the persistent compile cache may hold executables AOT-compiled for the
    # axon terminal's machine type; don't load those into the test process
    env["PMPC_TPU_NO_CACHE"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    argv0 = sys.argv[0]
    if os.path.basename(argv0).startswith("pytest") and os.access(argv0, os.X_OK):
        os.execve(argv0, sys.argv, env)
    else:  # invoked as `python -m pytest ...`
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
