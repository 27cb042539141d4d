"""Data-seam tests: decode from senone-score dumps (the ps_decode_senscr
test seam), trace log dirs, senone dump round trips."""

import numpy as np
import pytest

from pocketsphinx_tpu.decoder import Decoder
from pocketsphinx_tpu.fileio import read_sen

from conftest import DATADIR, EN_US, GOLDEN, require_model


def test_decode_from_golden_senscores():
    """Decoding directly from the reference's own senone scores must give
    the golden hypothesis (stage-isolation seam, acmod senfh)."""
    require_model()
    sen_path = GOLDEN / "goforward" / "000000000.sen"
    if not sen_path.exists():
        pytest.skip("golden dumps missing")
    golden, active, _ = read_sen(str(sen_path))
    # reconstruct per-audio-frame scores from the interleaved dump
    T = 278
    gi = [t if t < 6 else 2 * t - 5 for t in range(T)]
    costs = golden[gi].astype(np.float32)
    d = Decoder(hmm=str(EN_US), lm=str(DATADIR / "turtle.lm.bin"),
                dict=str(DATADIR / "turtle.dic"))
    d.decode_senscr(costs)
    assert d.hyp().hypstr == "go forward ten meters"


def test_trace_seam_dumps(tmp_path):
    require_model()
    mdir = tmp_path / "mfc"
    sdir = tmp_path / "sen"
    rdir = tmp_path / "raw"
    for p in (mdir, sdir, rdir):
        p.mkdir()
    d = Decoder(hmm=str(EN_US), lm=str(DATADIR / "turtle.lm.bin"),
                dict=str(DATADIR / "turtle.dic"),
                mfclogdir=str(mdir), senlogdir=str(sdir),
                rawlogdir=str(rdir))
    pcm = (DATADIR / "goforward.raw").read_bytes()
    d.decode_raw(pcm)
    from pocketsphinx_tpu.fileio import read_mfc
    cep = read_mfc(str(mdir / "000000000.mfc"))
    assert cep.shape == (278, 13)
    scores, act, base = read_sen(str(sdir / "000000000.sen"))
    assert scores.shape == (278, 5126)
    assert act.all()
    raw = (rdir / "000000000.raw").read_bytes()
    assert raw == pcm
