"""N-gram decoding end-to-end: the reference's golden accuracy anchor
(test/unit/test_ps.c:36 — goforward.raw + turtle LM must decode to
"go forward ten meters")."""

import numpy as np
import pytest

from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats
from pocketsphinx_tpu.lm.ngram import read_lm
from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder

from conftest import DATADIR, EN_US, require_model


@pytest.fixture(scope="module")
def decoder():
    require_model()
    am = AcousticModel.load(str(EN_US))
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(str(DATADIR / "turtle.lm.bin"), lw=6.5, wip=0.65)
    return NgramFlatDecoder(am, d2p, lm)


@pytest.fixture(scope="module")
def goforward_feats():
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    return compute_feats(fe.process(pcm), cmn="batch")


def test_goforward_hypothesis(decoder, goforward_feats):
    hyp, segs = decoder.decode(goforward_feats)
    assert hyp == "go forward ten meters"
    # segmentation close to the reference CLI output
    # (go 46-63, forward 64-120, ten 121-152, meters 153-211)
    by_word = {s.word: s for s in segs}
    assert abs(by_word["go"].start - 46) <= 2
    assert abs(by_word["forward"].start - 64) <= 2
    assert abs(by_word["ten"].start - 121) <= 2
    assert abs(by_word["meters"].start - 153) <= 3
    # segments tile the utterance
    assert segs[0].start == 0
    assert segs[-1].end == len(goforward_feats) - 1
    for a, b in zip(segs, segs[1:]):
        assert b.start == a.end + 1
