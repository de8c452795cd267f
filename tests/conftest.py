"""Test configuration: force the CPU backend with 8 virtual devices so the
data-parallel mesh paths are exercised without real TPU hardware.

Note: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin wins over the env var, so we must also force the platform through
jax.config. The TPU tunnel also leaves non-daemon threads that stall
interpreter shutdown for minutes; a session-finish hard-exit avoids that.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


_EXIT_STATUS = [0]


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS[0] = int(exitstatus)


def pytest_unconfigure(config):
    # Flush output and skip the slow axon-plugin teardown (runs after the
    # terminal summary has been printed).
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_EXIT_STATUS[0])
