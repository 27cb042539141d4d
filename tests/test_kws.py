"""Keyword spotting tests (mirror test_keyphrase.c and the goforward.kws
fixture with its deliberately malformed lines)."""

import numpy as np
import pytest

from pocketsphinx_tpu.decoder import Decoder
from pocketsphinx_tpu.search.kws import parse_kws_file

from conftest import DATADIR, EN_US, MODELDIR, require_model


def test_kws_file_parsing():
    phrases = parse_kws_file(str(DATADIR / "goforward.kws"), 1e-30)
    names = [p for p, _ in phrases]
    assert "anything" in names and "forward" in names
    # malformed "/"-lines are skipped
    assert not any("bad line" in p for p in names)
    by = dict(phrases)
    assert by["anything"] == 1e-10
    assert by["forward"] == 1e-30


def test_kws_file_decode():
    """test_keyphrase.c: goforward.raw + goforward.kws must detect
    "forward meters" (unknown-word phrases skipped with warnings)."""
    require_model()
    d = Decoder(hmm=str(EN_US),
                dict=str(MODELDIR / "en-us" / "cmudict-en-us.dict"),
                kws=str(DATADIR / "goforward.kws"))
    pcm = (DATADIR / "goforward.raw").read_bytes()
    assert d.decode_raw(pcm).hypstr == "forward meters"
    segs = list(d.seg_iter())
    by = {s.word: s for s in segs}
    assert 85 <= by["forward"].start_frame <= 100
    assert 150 <= by["meters"].start_frame <= 180


def test_single_keyphrase():
    require_model()
    d = Decoder(hmm=str(EN_US), dict=str(DATADIR / "turtle.dic"),
                keyphrase="forward", kws_threshold=1e-20)
    pcm = (DATADIR / "goforward.raw").read_bytes()
    assert d.decode_raw(pcm).hypstr == "forward"
