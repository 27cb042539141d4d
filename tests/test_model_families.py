"""Model-family coverage: semi-continuous (tidigits, 5-state, s2_4x
features) and fully-continuous (an4) models — mirrors
test-tidigits-fsg.sh and the an4_ci_cont fixtures."""

import glob

import numpy as np
import pytest

from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.fileio import read_mfc
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats_typed
from pocketsphinx_tpu.lm.fsg import FsgModel
from pocketsphinx_tpu.search.fsg import FsgDecoder
from pocketsphinx_tpu.search.align import Aligner

from conftest import DATADIR

TIDIGITS = DATADIR / "tidigits"
AN4 = DATADIR / "an4_ci_cont"


@pytest.mark.skipif(not TIDIGITS.is_dir(), reason="tidigits missing")
def test_tidigits_semi_continuous_fsg():
    am = AcousticModel.load(str(TIDIGITS / "hmm"))
    assert am.model_type == "semi"
    assert am.mdef.n_emit_state == 5
    assert list(am.gauden.featlen) == [12, 24, 3, 12]
    d = Dictionary(am.mdef, str(TIDIGITS / "lm" / "tidigits.dic"))
    d2p = Dict2Pid(am.mdef, d)
    fsg = FsgModel.readfile(str(TIDIGITS / "lm" / "tidigits.fsg"), lw=6.5)
    dec = FsgDecoder(am, d2p, fsg)
    expect = {}
    match = TIDIGITS / "test-tidigits-fsg.match"
    for line in match.read_text().splitlines():
        words, rest = line.rsplit("(", 1)
        expect[rest.split()[0]] = words.strip()
    ok = tot = 0
    for f in sorted(glob.glob(str(TIDIGITS / "man.ah.*.mfc")))[:8]:
        fid = f.split("/")[-1][:-4]
        feats, _ = compute_feats_typed(read_mfc(f), feat_type="s2_4x",
                                       cmn="current")
        hyp, _ = dec.decode(feats)
        tot += 1
        ok += (hyp == expect.get(fid))
    # 8/8 parity with the reference's own hypotheses (the historical
    # 7/8 miss was the semi-scorer 4-bit sendump nibble decode,
    # src/s2_semi_mgau.c:694-699 vs the PTM quirk at ptm_mgau.c:377)
    assert ok == tot, f"{ok}/{tot}"


@pytest.mark.skipif(not AN4.is_dir(), reason="an4 model missing")
def test_an4_continuous_align():
    am = AcousticModel.load(str(AN4))
    assert am.model_type == "cont"
    assert am.gauden.n_mgau == am.n_sen  # one codebook per senone
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(AN4 / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    cep = MelFrontend().process(pcm)
    feats, fl = compute_feats_typed(cep, feat_type="1s_c_d_dd",
                                    cmn="current")
    assert feats.shape[1:] == (1, 39)
    words, phones, states = Aligner(am, d2p).align(
        feats, "go forward ten meters".split())
    texts = [w.text for w in words if w.text != "<sil>"]
    assert texts == ["go", "forward", "ten", "meters"]
    # boundaries in the same neighborhood as the en-us model's
    by = {w.text: w for w in words}
    assert abs(by["go"].start - 46) <= 5
    assert abs(by["meters"].start - 153) <= 6


@pytest.mark.skipif(not AN4.is_dir(), reason="an4 model missing")
def test_an4_continuous_decode():
    """Continuous-model n-gram *decode* anchor: an4_ci_cont +
    turtle.lm.bin on goforward.raw, matching the reference binary's
    hypothesis and word boundaries (config of test/unit/test_mllr.c
    sans MLLR; oracle captured from /root/ref-build/pocketsphinx:
    hyp 'go forward ten meters', go@0.46 forward@0.63 ten@1.20
    meters@1.53s)."""
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    am = AcousticModel.load(str(AN4))
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(AN4 / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(str(DATADIR / "turtle.lm.bin"), lw=6.5, wip=0.65)
    dec = NgramFusedDecoder(am, d2p, lm)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    cep = MelFrontend().process(pcm)
    feats, _ = compute_feats_typed(cep, feat_type="1s_c_d_dd",
                                   cmn="current")
    hyp, segs = dec.decode(feats)
    assert hyp == "go forward ten meters"
    by = {s.word: s for s in segs}
    for w, sf in [("go", 46), ("forward", 63), ("ten", 120),
                  ("meters", 153)]:
        assert abs(by[w].start - sf) <= 3, (w, by[w].start, sf)


def test_s2_4x_feature_shape():
    cep = np.random.RandomState(0).randn(50, 13).astype(np.float32)
    feats, fl = compute_feats_typed(cep, feat_type="s2_4x", cmn="none")
    assert feats.shape == (50, 4, 24)
    assert fl == [12, 24, 3, 12]
    # stream 0 = c1..c12
    np.testing.assert_allclose(feats[:, 0, :12], cep[:, 1:], atol=1e-6)
    # padding lanes zero
    assert (feats[:, 0, 12:] == 0).all()
    assert (feats[:, 2, 3:] == 0).all()


def test_subvec_parse():
    from pocketsphinx_tpu.frontend.feat import parse_subvecs
    sv = parse_subvecs("0-12/13-25/26-38")
    assert [len(s) for s in sv] == [13, 13, 13]
    sv2 = parse_subvecs("24,0-11/25,12-23/26-38")
    assert list(sv2[0]) == [24] + list(range(12))


@pytest.mark.skipif(not TIDIGITS.is_dir(), reason="tidigits missing")
def test_tidigits_ngram_decode():
    """N-gram mode with the 5-state semi-continuous model."""
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder
    am = AcousticModel.load(str(TIDIGITS / "hmm"))
    d = Dictionary(am.mdef, str(TIDIGITS / "lm" / "tidigits.dic"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(str(TIDIGITS / "lm" / "tidigits.lm.bin"), lw=6.5,
                 wip=0.65)
    dec = NgramFlatDecoder(am, d2p, lm)
    feats, _ = compute_feats_typed(
        read_mfc(str(TIDIGITS / "man.ah.2934za.mfc")),
        feat_type="s2_4x", cmn="current")
    hyp, _ = dec.decode(feats)
    assert hyp == "two nine three four zero"


def test_large_vocab_trigram_mode():
    """A 600+-word vocabulary (far above round 1's 300-word trigram cube
    limit) decodes with FULL trigram context rows engaged — the dense
    per-context row table scales O(V + n_bigrams), not O(V^2)."""
    import io
    import random
    from pocketsphinx_tpu.lm.arpabo import ArpaBoLM
    from pocketsphinx_tpu.lm.ngram import read_arpa
    from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats
    am = AcousticModel.load(str(DATADIR.parent.parent
                                / "model" / "en-us" / "en-us"))
    d = Dictionary(am.mdef,
                   str(DATADIR.parent.parent / "model" / "en-us"
                       / "cmudict-en-us.dict"),
                   str(DATADIR.parent.parent / "model" / "en-us"
                       / "en-us" / "noisedict"))
    rng = random.Random(7)
    vocab = rng.sample([w for w in list(d._index)[:20000]
                        if w.isalpha()], 600)
    for w in ("go", "forward", "ten", "meters"):
        if w not in vocab:
            vocab.append(w)
    sents = [" ".join(rng.sample(vocab, rng.randint(3, 7)))
             for _ in range(1500)]
    sents += ["go forward ten meters"] * 20
    buf = io.StringIO()
    ArpaBoLM(text="\n".join(sents), add_start=True).write(buf)
    import tempfile, os
    fd, tmp = tempfile.mkstemp(suffix=".arpa")
    os.close(fd)
    open(tmp, "w").write(buf.getvalue())
    lm = read_arpa(tmp).apply_weights(6.5, 0.65)
    os.unlink(tmp)
    assert lm.counts[0] > 300   # round 1's trigram cube limit
    dec = NgramFlatDecoder(am, Dict2Pid(am.mdef, d), lm)
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    hyp, _ = dec.decode(feats)
    assert hyp == "go forward ten meters"
    assert dec.lm_order_used == 3   # full trigram rows engaged
    from conftest import assert_ctx_rows_exact
    assert_ctx_rows_exact(dec, t_stride=23)
