import os
import sys

# Sharding/kernel tests run on a virtual 8-device CPU mesh unless the suite
# is explicitly pointed at real hardware (BROTLIG_TEST_TPU=1).
if os.environ.get("BROTLIG_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
