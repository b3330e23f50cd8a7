"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a TPU-relay PJRT backend at
interpreter start and reads platform/XLA flags before any conftest code can
run, so setting env vars here is too late.  Instead, re-exec pytest exactly
once with the CPU platform and the 8-device host flag set at process start.
"""
import os
import sys

_SENTINEL = "DEEPCLR_TPU_TESTS_REEXEC"

if os.environ.get(_SENTINEL) != "1":
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # Also disarm the TPU-relay PJRT registration entirely: when the relay
    # is unresponsive, merely *registering* the plugin wedges every jax
    # init in the process — even with JAX_PLATFORMS=cpu.  CPU tests have
    # no business touching the relay.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env[_SENTINEL] = "1"
    os.execvpe(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
