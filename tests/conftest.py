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


def assert_ctx_rows_exact(dec, t_stride=7, atol=0.05):
    """After a decode: every surviving exit's carried LM context row must
    equal the exact trie successor row of its carried (h2, h1) history —
    the trigram-exactness contract of the dense row-table search
    (ngram_flat._lm_tables vs src/lm/lm_trie.c walk-based scoring)."""
    import numpy as np
    SHIFT = 1 << 10
    escore, _, _, _, eh1, eh2, ectx = [np.asarray(r) for r in dec.records]
    lm, V = dec.lm, dec.V
    rows = dec._lm_rows
    checked = set()
    n = 0
    for t in range(0, escore.shape[0], t_stride):
        for e in range(escore.shape[1]):
            if escore[t, e] < -1e29:
                continue
            h1, h2, r = int(eh1[t, e]), int(eh2[t, e]), int(ectx[t, e])
            key = (h1, h2, r)
            if key in checked:
                continue
            checked.add(key)
            hist = (h1,) if h2 >= V else (h2, h1)
            exp = lm.successor_row(hist)[dec.col_lm] / SHIFT
            exp = np.where(dec.is_fill, 0.0, exp)
            np.testing.assert_allclose(
                rows[r], exp, atol=atol,
                err_msg=f"frame {t} exit {e} hist {hist} row {r}")
            n += 1
    assert n > 0
