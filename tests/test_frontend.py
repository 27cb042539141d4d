"""Frontend parity tests: PCM -> MFCC against reference golden dumps
(mirrors test/regression/test-sphinx_fe*.sh and the -mfclogdir seam)."""

import numpy as np
import pytest

import jax

from pocketsphinx_tpu.fileio import read_mfc
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats, compute_feats_jax

from conftest import DATADIR, GOLDEN, require_model


def en_us_frontend():
    # Parameters from model/en-us/en-us/feat.params
    return MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                       lifter_val=22, remove_noise=True)


@pytest.fixture(scope="module")
def goforward_pcm():
    raw = DATADIR / "goforward.raw"
    if not raw.exists():
        pytest.skip("reference test data missing")
    return np.frombuffer(raw.read_bytes(), dtype="<i2")


def test_mfcc_matches_reference_dump(goforward_pcm):
    gold = read_mfc(str(GOLDEN / "goforward" / "000000000.mfc"))
    fe = en_us_frontend()
    cep = fe.process(goforward_pcm)
    assert cep.shape == gold.shape
    assert np.abs(cep - gold).max() < 1e-4


def test_mfcc_jax_matches_numpy(goforward_pcm):
    fe = en_us_frontend()
    cep_np = fe.process(goforward_pcm)
    with jax.default_device(jax.devices("cpu")[0]):
        cep_j, nfr = fe.process_batch_jax(
            goforward_pcm[None, :].astype(np.float32))
    cep_j = np.asarray(cep_j)
    assert int(nfr[0]) == len(cep_np)
    assert np.abs(cep_j[0] - cep_np).max() < 2e-3


def test_mfcc_jax_batched_variable_lengths(goforward_pcm):
    """Padded batch of different lengths must equal per-utterance results."""
    fe = en_us_frontend()
    n1 = len(goforward_pcm)
    n2 = n1 // 2
    pcm = np.zeros((2, n1), dtype=np.float32)
    pcm[0, :n1] = goforward_pcm
    pcm[1, :n2] = goforward_pcm[:n2]
    with jax.default_device(jax.devices("cpu")[0]):
        cep, nfr = fe.process_batch_jax(pcm, np.array([n1, n2]))
    one = fe.process(goforward_pcm[:n2])
    t2 = int(nfr[1])
    assert t2 == len(one)
    assert np.abs(np.asarray(cep)[1, :t2] - one).max() < 2e-3


def test_feat_jax_matches_numpy(goforward_pcm):
    fe = en_us_frontend()
    cep = fe.process(goforward_pcm)
    feats_np = compute_feats(cep, cmn="batch")
    with jax.default_device(jax.devices("cpu")[0]):
        feats_j = np.asarray(compute_feats_jax(cep[None], cmn="batch"))[0]
    assert feats_j.shape == feats_np.shape
    assert np.abs(feats_j - feats_np).max() < 1e-4


def test_short_utterance_single_frame():
    fe = en_us_frontend()
    pcm = (np.sin(np.arange(300) * 0.1) * 1000).astype(np.int16)
    cep = fe.process(pcm)
    assert cep.shape == (1, 13)  # < frame_size: one zero-padded frame
    assert fe.process(np.zeros(0, np.int16)).shape[0] == 0

def test_feat_types_extended():
    """1s_c_d_ld_dd (52-dim), 1s_c_d (26), 1s_c (13) dispatch
    (feat_init, src/feat/feat.c:705-800)."""
    import numpy as np
    from pocketsphinx_tpu.frontend.feat import compute_feats_typed
    rng = np.random.RandomState(0)
    cep = rng.randn(50, 13).astype(np.float32)
    v4, l4 = compute_feats_typed(cep, "1s_c_d_ld_dd", cmn="none")
    v3, l3 = compute_feats_typed(cep, "1s_c_d_dd", cmn="none")
    v2, l2 = compute_feats_typed(cep, "1s_c_d", cmn="none")
    v1, l1 = compute_feats_typed(cep, "1s_c", cmn="none")
    assert (l4, l3, l2, l1) == ([52], [39], [26], [13])
    a4, a3, a2 = v4[:, 0], v3[:, 0], v2[:, 0]
    np.testing.assert_allclose(a4[:, :13], cep)
    np.testing.assert_allclose(v1[:, 0], cep)
    # short delta and dd agree with 1s_c_d_dd away from the edges
    np.testing.assert_allclose(a4[4:-4, 13:26], a3[4:-4, 13:26])
    np.testing.assert_allclose(a2[4:-4, 13:26], a3[4:-4, 13:26])
    np.testing.assert_allclose(a4[4:-4, 39:52], a3[4:-4, 26:39])
    # long delta is literally cep[t+4] - cep[t-4]
    np.testing.assert_allclose(a4[20, 26:39], cep[24] - cep[16])

