import os

# Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
# logic is exercised without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
