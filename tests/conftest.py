import os

# Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
# logic is exercised without TPU hardware.  Something in this environment
# forces jax_platforms to "axon,cpu" at import, so override via jax.config
# rather than the environment.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
