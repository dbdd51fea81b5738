import os
import sys

# Sharding/kernel tests run on a virtual 8-device CPU mesh unless the suite
# is explicitly pointed at real hardware (BROTLIG_TEST_TPU=1).
#
# Note: on this machine the experimental 'axon' jax platform (tunneled TPU)
# ignores JAX_PLATFORMS=cpu and stays the default device, which makes every
# eager op pay a network round trip. Pin the default device to local CPU
# instead; TPU tests opt in explicitly.
if os.environ.get("BROTLIG_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from brotlig_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
