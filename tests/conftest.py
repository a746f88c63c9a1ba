import os

# Force CPU with 8 virtual devices so multi-chip sharding logic is exercised
# without TPU hardware (must run before jax import). The outer environment
# pins JAX_PLATFORMS to the TPU tunnel, so this must be a hard override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU-tunnel plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# via jax.config at interpreter boot, so the env var alone is not enough — every
# op would cross the network tunnel. Override via config before any backend
# initializes.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch fp32; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
