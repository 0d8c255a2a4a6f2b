"""Test configuration: virtual 8-device CPU mesh + float64 parity support.

The container pins ``JAX_PLATFORMS=axon`` (remote-TPU tunnel) via
sitecustomize, and every eager op across that tunnel is a ~4 ms network round
trip — tests must run on local CPU. ``jax.config.update`` wins over the env
var, and the forced host-device count gives an 8-device mesh for the
multi-chip sharding tests (same mechanism the driver's ``dryrun_multichip``
uses).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
