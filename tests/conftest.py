"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: simulated sharding via xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# no JAX_ENABLE_X64: the package targets TPU-native 32-bit types (f32/i32
# with in-kernel renormalization where the C reference used double)
# NOTE: do NOT enable jax's persistent compilation cache here — measured 8x
# slower compiles for these kernels (102s vs 13s for the chain scan).

# this image's sitecustomize pre-registers the axon TPU backend and pins
# jax_platforms to "axon,cpu"; force pure CPU for the virtual 8-device mesh
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
