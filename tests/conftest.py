"""Test configuration: force an 8-device CPU mesh before JAX initializes.

The reference had no multi-device test analogue (SURVEY.md §4); on TPU we
validate sharding on virtual CPU devices so the full pjit/Mesh path runs in CI
without hardware.
"""

import os
import sys

# Force CPU even if the ambient environment pins JAX_PLATFORMS to a TPU
# backend: unit tests must be hermetic and run the virtual 8-device mesh.
# Also drop the axon TPU-tunnel site dir (it hooks XLA compilation and slows
# CPU compiles ~6x) — tests never talk to the TPU.
# Stash the ambient TPU env first so opt-in hardware tests (SDVAR_TPU_TESTS=1,
# e.g. test_conv_s8.test_s8_kernel_exact_on_hardware) can hand it to a
# subprocess that really talks to the chip.
for _k in ("JAX_PLATFORMS", "PYTHONPATH", "PALLAS_AXON_REMOTE_COMPILE"):
    if _k in os.environ and ("SDVAR_HW_" + _k) not in os.environ:
        os.environ["SDVAR_HW_" + _k] = os.environ[_k]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path[:] = [p for p in sys.path if "axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if "axon_site" not in p
)

# sitecustomize may have imported jax (registering a TPU plugin) before this
# conftest ran, making the env vars above too late. jax.config.update works
# until the first backend initialization, which hasn't happened yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected >=8 virtual CPU devices"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# NOTE on the former per-module jax.clear_caches() workaround: a serial
# full-suite run used to accumulate hundreds of jitted programs in one
# process until XLA:CPU SIGABRT'd near the end (test_train_mesh's donated
# 8-device train_step). The suite now runs under pytest-xdist
# (pyproject.toml addopts), which splits modules across worker PROCESSES —
# per-process compiled-executable growth stays far below the crash regime,
# so the cache-dropping (and the recompiles it caused) is gone.
