import os
import pathlib

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; set this
# before JAX is imported anywhere.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest

REFERENCE = pathlib.Path(os.environ.get("PS_REFERENCE", "/root/reference"))
MODELDIR = REFERENCE / "model"
DATADIR = REFERENCE / "test" / "data"
EN_US = MODELDIR / "en-us" / "en-us"
GOLDEN = pathlib.Path(__file__).parent / "golden"


def require_model():
    if not EN_US.is_dir():
        pytest.skip("en-us model not available")


@pytest.fixture(scope="session")
def en_us_dir():
    require_model()
    return EN_US
