"""Test harness: fake 8-device CPU mesh (SURVEY.md §4.4).

The axon sitecustomize pins `jax_platforms="axon,cpu"` at interpreter start
(overriding the JAX_PLATFORMS env var), so tests must force CPU via
jax.config AFTER import but before any backend use. XLA_FLAGS must carry the
host-device-count flag before backend init; backends are lazy, so setting it
here (collection time) is early enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover - defensive
    from jax.extend.backend import clear_backends

    clear_backends()


def pytest_report_header(config):
    return (
        f"jax {jax.__version__} devices={jax.device_count()} "
        f"({jax.default_backend()})"
    )
