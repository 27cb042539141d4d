"""FSG/JSGF decoding tests (mirror test-cards.sh, test_jsgf.c, test_fsg)."""

import wave

import numpy as np
import pytest

from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats
from pocketsphinx_tpu.lm.fsg import FsgModel
from pocketsphinx_tpu.lm.jsgf import Jsgf, JsgfError
from pocketsphinx_tpu.search.fsg import FsgDecoder

from conftest import DATADIR, EN_US, MODELDIR, require_model


@pytest.fixture(scope="module")
def am():
    require_model()
    return AcousticModel.load(str(EN_US))


@pytest.fixture(scope="module")
def fe():
    return MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                       lifter_val=22, remove_noise=True)


@pytest.fixture(scope="module")
def goforward_feats(fe):
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    return compute_feats(fe.process(pcm), cmn="batch")


def test_fsg_file_decode(am, goforward_feats):
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    fsg = FsgModel.readfile(str(DATADIR / "goforward.fsg"), lw=6.5)
    assert fsg.n_state == 7
    assert fsg.start_state == 0 and fsg.final_state == 6
    hyp, segs = FsgDecoder(am, d2p, fsg).decode(goforward_feats)
    assert hyp == "go forward ten meters"


def test_jsgf_decode(am, goforward_feats):
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    j = Jsgf.parse_file(str(DATADIR / "goforward.gram"))
    assert set(j.rules) == {"move", "move2", "direction", "distance"}
    assert j.public == ["move", "move2"]
    fsg = j.build_fsg("move2", lw=6.5)
    hyp, _ = FsgDecoder(am, d2p, fsg).decode(goforward_feats)
    assert hyp == "go forward ten meters"


def test_jsgf_malformed():
    for name in ("defective.gram", "invalid.gram", "fuzzed.gram"):
        p = DATADIR / name
        if not p.exists():
            continue
        try:
            j = Jsgf.parse_file(str(p))
            j.build_fsg(None, lw=6.5)
        except (JsgfError, ValueError, KeyError, RecursionError):
            pass  # must reject cleanly, not crash


def test_cards_regression(am, fe):
    """5-utterance cards set must reproduce the reference's own
    hypotheses exactly (test/data/cards/cards.hyp)."""
    d = Dictionary(am.mdef, str(MODELDIR / "en-us" / "cmudict-en-us.dict"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    fsg = Jsgf.parse_file(
        str(DATADIR / "cards" / "cards.gram")).build_fsg(None, lw=6.5)
    dec = FsgDecoder(am, d2p, fsg)
    expect = {}
    for line in (DATADIR / "cards" / "cards.hyp").read_text().splitlines():
        words, rest = line.rsplit("(", 1)
        expect[rest.split()[0]] = words.strip()
    for fid, want in expect.items():
        with wave.open(str(DATADIR / "cards" / f"{fid}.wav")) as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        feats = compute_feats(fe.process(pcm), cmn="batch")
        hyp, _ = dec.decode(feats)
        assert hyp == want, f"{fid}: {hyp!r} != {want!r}"


def test_fsg_roundtrip(tmp_path):
    fsg = FsgModel.readfile(str(DATADIR / "goforward.fsg"), lw=6.5)
    out = tmp_path / "rt.fsg"
    fsg.writefile(str(out))
    fsg2 = FsgModel.readfile(str(out), lw=6.5)
    assert fsg2.n_state == fsg.n_state
    assert len(fsg2.links) == len(fsg.links)
    assert sorted(fsg2.vocab) == sorted(fsg.vocab)
