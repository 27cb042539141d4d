"""20k-word realistic-scale decode (VERDICT r2 next #2): the committed
bench-20k task (20,043 cmudict words, 580k bigrams / 660k trigrams)
must build within the LM budget via the scalable mode-B path, keep
lm_order_used == 3, and decode the anchor utterance correctly.

The full corpus WER run (librivox + goforward vs the reference binary's
committed WER on the same task, tests/golden/wer20k/ref.json) executes
in bench.py on the TPU every round; this CPU test is gated behind
PS_SLOW_20K=1 because a 20k-word decode takes minutes on the host.
Mode-B LM exactness itself is proven per-frame by the trie-walk oracle
in test_ngram_fused.py (lm_mode="sparse" parametrization)."""

import os

import numpy as np
import pytest

from conftest import DATADIR, EN_US, require_model

pytestmark = pytest.mark.skipif(
    not os.environ.get("PS_SLOW_20K"),
    reason="20k-word CPU decode is slow; set PS_SLOW_20K=1 "
           "(runs on TPU in bench.py every round)")


def test_20k_decode():
    require_model()
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    am = AcousticModel.load(str(EN_US))
    d = Dictionary(am.mdef, os.path.join(here, "bench_data/bench-20k.dic"),
                   str(EN_US / "noisedict"))
    lm = read_lm(os.path.join(here, "bench_data/bench-20k.lm.bin"),
                 lw=6.5, wip=0.65)
    dec = NgramFusedDecoder(am, Dict2Pid(am.mdef, d), lm)
    assert dec.W >= 20000
    dec._lm_tables()
    assert dec.lm_mode == "sparse"
    assert dec.lm_order_used == 3
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    hyp, segs = dec.decode(feats)
    assert hyp == "go forward ten meters"


def test_20k_tp_sharded_lm_tables():
    """TP at realistic scale (round-3 review weak #8): the 20k config's
    mode-B LM tables — the only GB-scale arrays — shard on the model
    axis of a dp=4 x tp=2 virtual mesh and the sharded decode must
    reproduce the unsharded hypothesis."""
    require_model()
    import numpy as np
    from jax.sharding import Mesh
    import jax
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder
    from pocketsphinx_tpu.parallel import BatchDecodePipeline

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    am = AcousticModel.load(str(EN_US))
    d = Dictionary(am.mdef, os.path.join(here, "bench_data/bench-20k.dic"),
                   str(EN_US / "noisedict"))
    lm = read_lm(os.path.join(here, "bench_data/bench-20k.lm.bin"),
                 lw=6.5, wip=0.65)
    dec = NgramFusedDecoder(am, Dict2Pid(am.mdef, d), lm)
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    from pocketsphinx_tpu.frontend.feat import compute_feats
    ref_hyp, _ = dec.decode(compute_feats(fe.process(pcm), cmn="batch"))
    devs = jax.devices("cpu")[:8]
    mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    pipe = BatchDecodePipeline(dec, fe, mesh=mesh)
    res = pipe.decode_corpus([pcm] * 4, batch_size=4)
    assert dec.lm_mode == "sparse"
    for r in res:
        assert r[0] == ref_hyp
