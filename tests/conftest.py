import os
import sys

# Sharding/kernel tests run on a virtual 8-device CPU mesh unless the suite
# is explicitly pointed at real hardware (BROTLIG_TEST_TPU=1).
#
# Note: on this machine the 'axon' jax platform (tunneled TPU) is force-
# registered by a sitecustomize and JAX_PLATFORMS=axon in the environment.
# The tunnel admits a single client: if any other process holds it (e.g. a
# persistent perf-iteration worker), *backend init itself blocks forever* in
# every new process. CPU-only test runs must therefore deregister the axon
# factory before the first device lookup — merely pinning jax_default_device
# is not enough, since jax.devices() initializes every registered platform.
if os.environ.get("BROTLIG_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from brotlig_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()
