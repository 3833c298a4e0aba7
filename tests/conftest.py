"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is tested on a virtual CPU mesh (no multi-chip TPU
hardware available); the driver separately dry-runs the multichip path.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
