import os
import pathlib

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; set this
# before JAX is imported anywhere.  NOTE: JAX_PLATFORMS is overridden by the
# environment's TPU plugin, so tests force the CPU backend via
# jax_default_device below instead.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import pytest

jax.config.update("jax_default_device", jax.devices("cpu")[0])

REFERENCE = pathlib.Path(os.environ.get("PS_REFERENCE", "/root/reference"))
MODELDIR = REFERENCE / "model"
DATADIR = REFERENCE / "test" / "data"
EN_US = MODELDIR / "en-us" / "en-us"
GOLDEN = pathlib.Path(__file__).parent / "golden"


def cpu_mesh(n: int):
    """An n-device CPU mesh for sharding tests."""
    from jax.sharding import Mesh
    import numpy as np
    devs = jax.devices("cpu")[:n]
    return Mesh(np.array(devs), ("data",))


def require_model():
    if not EN_US.is_dir():
        pytest.skip("en-us model not available")


@pytest.fixture(scope="session")
def en_us_dir():
    require_model()
    return EN_US
