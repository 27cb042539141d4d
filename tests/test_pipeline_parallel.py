"""Pipeline parallelism (SURVEY §2.3 PP): frontend+scoring on device 0,
Viterbi scan on device 1, micro-batches in flight; hyps identical to
single-device decoding and the stage outputs genuinely live on the two
different devices."""

import numpy as np
import pytest

from conftest import DATADIR, EN_US, require_model


def test_two_stage_pipeline():
    require_model()
    import jax
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual devices")
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.parallel.pipeline import TwoStagePipeline

    am = AcousticModel.load(str(EN_US))
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    dec = NgramFusedDecoder(
        am, Dict2Pid(am.mdef, d),
        read_lm(str(DATADIR / "turtle.lm.bin"), lw=6.5, wip=0.65))
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(), "<i2")
    corpus = [pcm.astype(np.float32), pcm[:40000].astype(np.float32),
              pcm[:32000].astype(np.float32), pcm[8000:].astype(np.float32)]

    pipe = TwoStagePipeline(dec, fe, dev_score=cpus[0], dev_scan=cpus[1])
    # stage placement is real: outputs of each stage live on their device
    c, nfr = pipe._stage_score(corpus[0][None, :],
                               np.array([len(corpus[0])], np.int32))
    assert list(c.devices())[0] == cpus[0]
    res = pipe.decode_corpus(corpus, micro_batch=2)
    assert res[0][0] == "go forward ten meters"

    # identical to single-device decode through the same decoder
    from pocketsphinx_tpu.frontend.feat import compute_feats
    for i, p in enumerate(corpus):
        feats = compute_feats(fe.process(p.astype(np.int16)), cmn="batch")
        hyp, _ = dec.decode(feats)
        assert res[i][0] == hyp, (i, res[i][0], hyp)
