"""Mode C ("csr") LM path: the fully-sparse exact-trigram decoder LM
representation for reference-scale vocabularies (135k-word cmudict),
where even mode B's dense [V+1, E] bigram/context tables are O(V*E).

Contract: identical decoding behavior to mode B on the same task —
same hypothesis, same integer record streams, scores equal up to one
f32 rounding of the base row (the sparse base computes
f32(uni) + f32(bo) at runtime where the dense table stored
f32(f64(uni + bo))).  The fat-row path (giant-fanout histories such as
<s> get dense rows) is exercised by forcing FAT_CAP down to 2.
"""

import os

import numpy as np
import pytest

from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats
from pocketsphinx_tpu.lm.ngram import read_lm
from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder

from conftest import DATADIR, EN_US, require_model

# etf/etgt/ecx/eprw/erw1/erw2.  The guard count (rec 9, "viol") is a
# diagnostic, not decode semantics: modes rows/sparse use the tightened
# per-predecessor bound while csr falls back to the global bound, so
# counts legitimately differ across modes.
INT_RECS = [1, 2, 3, 5, 6, 7]
REC_NAMES = ["escore", "etf", "etgt", "ecx", "entv", "eprw",
             "erw1", "erw2", "m", "viol"]


@pytest.fixture(scope="module")
def setup():
    require_model()
    am = AcousticModel.load(str(EN_US))
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(str(DATADIR / "turtle.lm.bin"), lw=6.5, wip=0.65)
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    return am, d2p, lm, feats


def _decode_mode(setup, mode, fat_cap=None):
    am, d2p, lm, feats = setup
    os.environ["PS_LM_MODE"] = mode
    os.environ["PS_LM_TABLE_BYTES"] = "1000"
    try:
        dec = NgramFusedDecoder(am, d2p, lm)
        if fat_cap is not None:
            dec.FAT_CAP = fat_cap
        hyp, _ = dec.decode(feats)
    finally:
        del os.environ["PS_LM_MODE"]
        del os.environ["PS_LM_TABLE_BYTES"]
    return dec, hyp, [np.asarray(r) for r in dec.raw_records]


def _assert_equivalent(ra, rb):
    for i in INT_RECS:
        assert np.array_equal(ra[i], rb[i]), REC_NAMES[i]
    for i in (0, 4, 8):                    # escore/entv/m: f32 scores
        np.testing.assert_allclose(ra[i], rb[i], atol=2e-3,
                                   err_msg=REC_NAMES[i])


def test_csr_matches_sparse(setup):
    dec_b, hyp_b, recs_b = _decode_mode(setup, "sparse")
    dec_c, hyp_c, recs_c = _decode_mode(setup, "csr")
    assert dec_b.lm_mode == "sparse" and dec_c.lm_mode == "csr"
    assert dec_c.lm_order_used == 3
    assert hyp_c == hyp_b == "go forward ten meters"
    _assert_equivalent(recs_b, recs_c)


def test_csr_fat_rows(setup):
    """FAT_CAP=2 densifies nearly every history row — the fat path must
    reproduce the pure-CSR results exactly."""
    dec_c, hyp_c, recs_c = _decode_mode(setup, "csr")
    dec_f, hyp_f, recs_f = _decode_mode(setup, "csr", fat_cap=2)
    assert dec_f._lm_sparse["n_fat"] > 0
    assert hyp_f == hyp_c
    for i, name in enumerate(REC_NAMES):
        assert np.array_equal(recs_f[i], recs_c[i]), name
