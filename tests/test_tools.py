"""CLI tools, LM round trips, MLLR, native extension, batch CLI."""

import subprocess
import sys

import numpy as np
import pytest

from conftest import DATADIR, EN_US, REFERENCE, require_model

LMDIR = REFERENCE / "test" / "unit" / "test_ngram"


def test_lm_bin_roundtrip(tmp_path):
    from pocketsphinx_tpu.lm.ngram import read_trie_bin, write_trie_bin
    t = read_trie_bin(str(DATADIR / "turtle.lm.bin"))
    out = tmp_path / "rt.lm.bin"
    write_trie_bin(t, str(out))
    r = read_trie_bin(str(out))
    assert r.counts == t.counts
    assert r.words == t.words
    go, fwd = t.wid("go"), t.wid("forward")
    assert abs(r.raw_score(fwd, [go]) - t.raw_score(fwd, [go])) < 1.0


def test_dmp_reader_matches_trie():
    if not (LMDIR / "100.lm.dmp").exists():
        pytest.skip("dmp fixture missing")
    from pocketsphinx_tpu.lm.ngram import read_dmp, read_trie_bin
    d = read_dmp(str(LMDIR / "100.lm.dmp"))
    t = read_trie_bin(str(LMDIR / "100.lm.bin"))
    assert d.counts == t.counts
    assert d.words == t.words
    dd, hh, da = d.wid("daines"), d.wid("huggins"), d.wid("david")
    assert abs(d.raw_score(dd, [da, hh]) - -9452) < 15
    assert abs(d.raw_score(hh, [da]) - -831) < 5


def test_dmp_write_roundtrip(tmp_path):
    """lm_convert three-way conversion incl. DMP *write* (the reference
    advertises -ofmt dmp, programs/pocketsphinx_lm_convert.c:102, but
    its writer supports only ARPA/BIN, src/lm/ngram_model.c:185-206 —
    we restore it).  Round trip: trie bin -> DMP -> scores equal."""
    from pocketsphinx_tpu.lm.ngram import read_trie_bin, read_dmp, write_dmp
    t = read_trie_bin(str(DATADIR / "turtle.lm.bin"))
    out = tmp_path / "turtle.lm.dmp"
    write_dmp(t, str(out))
    r = read_dmp(str(out))
    assert r.counts == t.counts
    assert r.words == t.words
    # score parity within f32-log10 quantization on every bigram +
    # a trigram/backoff sample
    go, fwd, ten = t.wid("go"), t.wid("forward"), t.wid("ten")
    for w, hist in [(fwd, [go]), (ten, [go, fwd]), (go, [ten, fwd]),
                    (go, []), (ten, [fwd])]:
        assert abs(r.raw_score(w, hist) - t.raw_score(w, hist)) < 2.0, \
            (w, hist)
    # and through the CLI tool
    from pocketsphinx_tpu.cli_tools import lm_convert_main
    out2 = tmp_path / "cli.lm.dmp"
    assert lm_convert_main(["-i", str(DATADIR / "turtle.lm.bin"),
                            "-o", str(out2), "-ofmt", "dmp"]) == 0
    r2 = read_dmp(str(out2))
    assert r2.counts == t.counts


def test_lmctl_class_lms():
    if not (LMDIR / "100.lmctl").exists():
        pytest.skip("lmctl fixture missing")
    from pocketsphinx_tpu.lm.lmset import NgramModelSet
    ms = NgramModelSet.read_lmctl(str(LMDIR / "100.lmctl"), lw=6.5,
                                  wip=0.65)
    assert set(ms.models) == {"100", "102", "turtle"}
    m = ms.current()
    assert m.wid("karybdis") == m.base.wid("scylla")
    ms.select("turtle")
    assert ms.active == "turtle"


def test_mllr(tmp_path):
    require_model()
    from pocketsphinx_tpu.models.mllr import Mllr
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    mllr = Mllr.read(str(DATADIR / "mllr_matrices"))
    assert mllr.n_feat == 1
    am = AcousticModel.load(str(DATADIR / "an4_ci_cont"))
    before = am.gauden.means.copy()
    mllr.transform(am.gauden)
    assert not np.allclose(am.gauden.means, before)
    assert np.isfinite(am.gauden.means).all()


def test_native_extension_matches_python():
    ps_native = pytest.importorskip("pocketsphinx_tpu.ps_native")
    rng = np.random.RandomState(0)
    T, W = 40, 9
    escore = rng.rand(T, W).astype(np.float32)
    estf = np.minimum(rng.randint(0, T, (T, W)),
                      np.arange(T)[:, None]).astype(np.int32)
    eprw = rng.randint(0, W, (T, W)).astype(np.int32)
    segs = ps_native.backtrace(escore, estf, eprw, 3, T)
    # python reference
    ref = []
    t, w = T - 1, 3
    while t >= 0 and w >= 0:
        s = int(estf[t, w])
        ref.append((w, s, t))
        p = int(eprw[t, w])
        if s <= 0 or p < 0:
            break
        w, t = p, s - 1
    ref.reverse()
    assert segs == ref


def test_yin_pitch_tone():
    from pocketsphinx_tpu.cli_tools import yin_pitch
    t = np.arange(8000) / 16000
    tone = (np.sin(2 * np.pi * 150 * t) * 10000).astype(np.int16)
    f0 = yin_pitch(tone)
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 150) < 3


def test_arpabo_builder(tmp_path):
    import io
    from pocketsphinx_tpu.lm.arpabo import ArpaBoLM
    from pocketsphinx_tpu.lm.ngram import read_arpa
    lm = ArpaBoLM(text="a b c\na b d\n", add_start=True)
    buf = io.StringIO()
    lm.write(buf)
    p = tmp_path / "t.arpa"
    p.write_text(buf.getvalue())
    m = read_arpa(str(p))
    assert m.order == 3
    assert m.wid("a") >= 0 and m.wid("<s>") >= 0
    # P(b|a) should beat P(c|a)? both seen; P(b|a) count 2 > c..
    assert m.raw_score(m.wid("b"), [m.wid("a")]) > \
        m.raw_score(m.wid("c"), [m.wid("a")])


def test_endpointer_segments_goforward():
    require_model()
    from pocketsphinx_tpu.vad.endpointer import Endpointer
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    segs = list(Endpointer().segment(pcm))
    assert len(segs) >= 1
    total_speech = sum(len(s) for _, _, s in segs) / 16000
    assert 1.0 < total_speech <= 2.8  # speech region of the 2.79 s clip


def test_batch_cli_mllrctl(tmp_path):
    """Per-speaker MLLR in the batch CLI (-mllrctl/-mllrdir/-mllrext,
    programs/pocketsphinx_batch.c process_mllrctl_line): consecutive
    identical names form a speaker group, each applied to the PRISTINE
    model (gauden_mllr_transform reload semantics)."""
    require_model()
    from pocketsphinx_tpu import cli_batch

    an4 = DATADIR / "an4_ci_cont"          # the bundled mllr matches an4
    raw = DATADIR / "goforward.raw"
    (tmp_path / "u1.raw").write_bytes(raw.read_bytes())
    (tmp_path / "u2.raw").write_bytes(raw.read_bytes())
    (tmp_path / "ctl").write_text("u1\nu2\n")
    (tmp_path / "mllrctl").write_text("mllr_matrices\nmllr_matrices\n")
    hyp = tmp_path / "hyp"
    args = ["-hmm", str(an4), "-lm", str(DATADIR / "turtle.lm.bin"),
            "-dict", str(DATADIR / "turtle.dic"),
            "-ctl", str(tmp_path / "ctl"), "-cepdir", str(tmp_path),
            "-cepext", ".raw", "-adcin", "yes", "-hyp", str(hyp)]
    rc = cli_batch.main(args + ["-mllrctl", str(tmp_path / "mllrctl"),
                                "-mllrdir", str(DATADIR)])
    assert rc == 0
    lines = hyp.read_text().strip().splitlines()
    assert len(lines) == 2
    # the transform is a real speaker adaptation: hyps must be produced
    # for every utterance (they may differ from the unadapted decode)
    assert all("(u" in l for l in lines)
    # and a fresh run WITHOUT mllr must decode from the pristine model
    # (the transform must not leak: reload-before-transform semantics)
    rc = cli_batch.main(args)
    assert rc == 0
    assert len(hyp.read_text().strip().splitlines()) == 2


def test_ds_downsampling():
    """-ds frame GMM downsampling (src/ptm_mgau.c:241-243): every
    ds-th frame scored, scores held between; goforward stays correct
    at ds=2 and the decode differs from ds=1 only in scores."""
    require_model()
    from pocketsphinx_tpu.decoder import Decoder

    d = Decoder(hmm=str(EN_US), lm=str(DATADIR / "turtle.lm.bin"),
                dict=str(DATADIR / "turtle.dic"), ds=2, bestpath=False)
    hyp = d.decode_raw((DATADIR / "goforward.raw").read_bytes())
    assert hyp.hypstr == "go forward ten meters"
