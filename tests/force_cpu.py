"""Early pytest plugin forcing JAX onto a virtual 8-device CPU mesh.

Loaded via ``addopts = -p tests.force_cpu`` so it runs before pytest's
output capture starts.  In the axon image a sitecustomize registers the TPU
backend at interpreter start; the only way to undo that is to re-exec the
interpreter with the hook disabled.
"""
import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("GEOMODELING_TEST_REEXEC") != "1"
):
    os.environ["GEOMODELING_TEST_REEXEC"] = "1"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
