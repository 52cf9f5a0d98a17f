"""Test configuration: run JAX on a virtual multi-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective logic is
exercised on 8 virtual CPU devices instead (SURVEY.md section 4e).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
