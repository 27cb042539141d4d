"""Lattice / bestpath / posterior / N-best tests (mirror test_lattice.c,
test_posterior.c, test_nbest.c, test_fwdtree_bestpath.c)."""

import numpy as np
import pytest

from pocketsphinx_tpu.decoder import Decoder
from pocketsphinx_tpu.search.lattice import Lattice

from conftest import DATADIR, EN_US, require_model


@pytest.fixture(scope="module")
def decoded():
    require_model()
    d = Decoder(hmm=str(EN_US), lm=str(DATADIR / "turtle.lm.bin"),
                dict=str(DATADIR / "turtle.dic"))
    pcm = (DATADIR / "goforward.raw").read_bytes()
    d.decode_raw(pcm)
    return d


def test_bestpath_hypothesis(decoded):
    # bestpath pass ran (config bestpath default yes) and kept the hyp
    assert decoded.hyp().hypstr == "go forward ten meters"
    lat = decoded.get_lattice()
    assert lat is not None
    assert lat.n_nodes > 5
    assert lat.n_links > 5


def test_posteriors(decoded):
    segs = list(decoded.seg_iter())
    by_word = {s.word: s for s in segs}
    # content words should have near-1 posteriors on this clean utterance
    for w in ("go", "forward", "ten", "meters"):
        assert by_word[w].prob > 0.9, (w, by_word[w].prob)
    for s in segs:
        assert 0.0 <= s.prob <= 1.0


def test_nbest(decoded):
    hyps = decoded.nbest(10)
    assert len(hyps) >= 1
    assert hyps[0][0] == "go forward ten meters"
    # scores descending
    scores = [s for _, s in hyps]
    assert scores == sorted(scores, reverse=True)


def test_lattice_write(decoded, tmp_path):
    lat = decoded.get_lattice()
    htk = tmp_path / "lat.slf"
    lat.write_htk(str(htk))
    text = htk.read_text()
    assert text.startswith("#")
    assert "N=" in text and "J=0" in text and "VERSION=1.0" in text
    nat = tmp_path / "lat.lat"
    lat.write(str(nat))
    text = nat.read_text()
    assert text.startswith("# getcwd: ")
    assert "Edges (FROM-NODEID TO-NODEID ASCORE)" in text
    assert text.rstrip().endswith("End")


def test_lattice_roundtrip(decoded, tmp_path):
    """write -> read preserves the DAG and its bestpath decision."""
    lat = decoded.get_lattice()
    p = tmp_path / "rt.lat"
    lat.write(str(p))
    lat2 = Lattice.read(str(p), dictionary=decoded.dict)
    assert lat2.n_frames == lat.n_frames
    # reachability pruning can only shrink the graph
    assert 0 < len(lat2.nodes) <= len(lat.nodes)
    lm = decoded._searches[decoded._active].lm
    hyp1, _, _ = lat.bestpath(lm=lm)
    hyp2, _, _ = lat2.bestpath(lm=lm)
    assert hyp2 == hyp1


def test_read_reference_lattice(decoded):
    """Interop: a DAG written by the reference binary (-outlatdir) loads
    and rescores to the reference hypothesis."""
    import pathlib
    gold = pathlib.Path(__file__).parent / "golden/goforward/goforward.lat"
    if not gold.exists():
        pytest.skip("golden lattice not captured")
    lat = decoded.read_lattice(str(gold))
    assert lat.n_frames == 278
    assert len(lat.nodes) > 0 and len(lat.links) > 0
    # every surviving node reaches the end by construction
    lm = decoded._searches[decoded._active].lm
    hyp, segs, _ = lat.bestpath(lm=lm)
    assert hyp == "go forward ten meters"
    # posteriors normalize on the read DAG too
    norm = lat.posterior()
    assert np.isfinite(norm)


def test_fsg_lattice(decoded):
    """FSG searches also produce lattice records."""
    d = decoded
    d.add_jsgf("g", str(DATADIR / "goforward.gram"), "move2")
    d.activate_search("g")
    d.decode_raw((DATADIR / "goforward.raw").read_bytes())
    assert d.hyp().hypstr == "go forward ten meters"
    lat = Lattice.from_flat_records(d._searches["g"])
    assert lat.n_links > 0
    d.activate_search("_default")

def test_htk_roundtrip(decoded, tmp_path):
    """write_htk -> read_htk preserves the DAG topology and bestpath."""
    lat = decoded.get_lattice()
    p = tmp_path / "rt.slf"
    lat.posterior()
    lat.write_htk(str(p))
    lat2 = Lattice.read_htk(str(p))
    assert 0 < len(lat2.nodes) <= len(lat.nodes)
    lm = decoded._searches[decoded._active].lm
    hyp1, _, _ = lat.bestpath(lm=lm)
    hyp2, _, _ = lat2.bestpath(lm=lm)
    assert hyp2 == hyp1
    # posteriors survived the p= field
    assert any(l.post > -1e29 for l in lat2.links)
    # malformed SLF fails cleanly
    bad = tmp_path / "bad.slf"
    bad.write_text("just nonsense\n")
    with pytest.raises(ValueError):
        Lattice.read_htk(str(bad))

