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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of jitted programs; near the end
    (test_train_mesh's 8-device donated train_step) XLA:CPU aborts
    (SIGABRT in backend_compile) — the same test passes in isolation and
    in any small combination. Bounding compiler-state growth keeps the
    one-command suite (`pytest tests/ -x -q`) stable on 2-core CI hosts.
    """
    yield
    import jax

    jax.clear_caches()
