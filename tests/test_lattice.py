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



def test_lattice_layer_reference_parity(decoded):
    """End-to-end lattice-layer parity against the reference binary's
    in-memory behavior (tests/golden/goforward/decode_oracle.txt,
    captured by tools/make_lattice_golden.sh): same bestpath hyp, seg
    posteriors ~1.0 on content words, sentence posterior in the same
    range, same N-best text.  Our lattices are built from dense
    records (different link density than the reference's beam-pruned
    bptable), so probability tolerances are loose; per-link algorithmic
    agreement is tested separately below."""
    import math
    import pathlib
    gold = pathlib.Path(__file__).parent / "golden/goforward/decode_oracle.txt"
    if not gold.exists():
        pytest.skip("decode oracle golden not captured")
    lines = gold.read_text().splitlines()
    ref_hyp = lines[0].split(": ")[1].rsplit(" (", 1)[0]
    ref_prob = float(lines[1].split()[2])
    assert decoded.hyp().hypstr == ref_hyp
    # rebuild from the search records (other tests replace/mutate the
    # decoder's cached lattice)
    search = decoded._searches[decoded._active]
    lat = Lattice.from_flat_records(search)
    lm = search.lm
    lat.bestpath(lm=lm, lwf=9.5 / 6.5, finish_word="</s>")
    post = lat.posterior(lm=lm, ascale=20.0)
    ours = math.exp(min(post, 0.0))
    # our dense-records lattice has more links than the reference's
    # beam-pruned bptable, so the normalizer sees extra mass; with the
    # dict_filler_word semantics fixed (<s>/</s> are real words in the
    # lattice math) the sentence posterior lands within 1.5x
    assert ref_prob / 1.5 < ours < 1.5 * ref_prob, (ours, ref_prob)
    segs = {s.word: s for s in decoded.seg_iter()}
    for w in ("go", "forward", "ten", "meters"):
        assert segs[w].prob > 0.9   # reference: 1.000
    nb = decoded.nbest(10)
    ref_best = [ln for ln in lines if ln.startswith("NBEST 1:")][0]
    assert nb[0][0] == ref_best.split(": ")[1].rsplit(" (", 1)[0]


def test_link_posterior_algorithm_parity(decoded):
    """Per-link alpha/beta parity on the reference-written DAG: our
    bestpath+posterior on tests/golden/goforward/goforward.lat must
    reproduce the reference's own in-memory link posteriors on EVERY
    shared per-destination link (the written DAG drops ascr>0 links,
    so 41 of the reference's 248 in-memory links are absent; the
    full-graph test below covers all of them)."""
    import math
    import pathlib
    gold = pathlib.Path(__file__).parent / "golden/goforward"
    if not (gold / "decode_oracle.txt").exists():
        pytest.skip("decode oracle golden not captured")
    lm = decoded._searches[decoded._active].lm
    lat = Lattice.read(str(gold / "goforward.lat"),
                       dictionary=decoded.dict)
    lat.bestpath(lm=lm, lwf=9.5 / 6.5)
    lat.posterior(lm=lm, ascale=20.0)
    ours = {}
    for l in lat.links:
        n, dst = lat.nodes[l.src], lat.nodes[l.dst]
        key = (n.word, n.sf, l.ef, dst.word)
        p = math.exp(l.post) if l.post > NEG_ISH else 0.0
        ours[key] = ours.get(key, 0.0) + p
    tot = bad = 0
    for ln in (gold / "decode_oracle.txt").read_text().splitlines():
        if not ln.startswith("LINK "):
            continue
        p = ln.split()
        key = (p[1], int(p[2]), int(p[3]), p[5])
        if key not in ours:
            continue   # dropped by ps_lattice_write (ascr > 0)
        tot += 1
        if abs(min(ours[key], 1.0) - min(float(p[-1]), 1.0)) > 0.05:
            bad += 1
    assert tot > 150
    assert bad == 0, f"{bad}/{tot} links beyond 0.05"


NEG_ISH = -1e29


def test_full_graph_link_posterior_parity(decoded):
    """ALL-links posterior parity on the reference's EXACT in-memory
    graph, reconstructed from the LINKG dump (decode_oracle.c): every
    one of the 248 links within 0.05 posterior, and the sentence
    posterior equal to the reference's (P(S|O)=0.1270) within 5% —
    algorithmic exactness of bestpath + forward/backward, including
    the dict_filler_word rule that <s>/</s> are REAL words in the
    lattice math (src/dict.c:417-428) so mid-utterance <s> paths pay
    their ~-inf LM probability."""
    import math
    import pathlib
    from pocketsphinx_tpu.search.lattice import LatNode, LatLink
    gold = pathlib.Path(__file__).parent / "golden/goforward"
    txt = (gold / "decode_oracle.txt").read_text() \
        if (gold / "decode_oracle.txt").exists() else ""
    if "LINKG" not in txt:
        pytest.skip("full-graph oracle golden not captured")
    d = decoded.dict
    lm = decoded._searches[decoded._active].lm
    lat = Lattice()
    node_of, links_ref = {}, []
    for ln in txt.splitlines():
        p = ln.split()
        if ln.startswith("LINKG "):
            links_ref.append((p[1], int(p[2]), int(p[3]), p[5],
                              int(p[6]), int(p[8]), float(p[10])))
        elif ln.startswith("ENDG "):
            end_key = (p[1], int(p[2]))
            lat.final_node_ascr = int(p[4])
        elif ln.startswith("PROB:"):
            ref_prob = float(p[2])

    def get_node(w, sf):
        if (w, sf) not in node_of:
            wid = d.wordid(w)
            n = LatNode(word=w, base=d.basestr(wid) if wid >= 0 else w,
                        sf=sf,
                        is_fill=d.is_filler(wid) if wid >= 0 else True,
                        id=len(lat.nodes))
            lat.nodes.append(n)
            node_of[(w, sf)] = n.id
        return node_of[(w, sf)]

    for fw, fsf, ef, tw, tsf, ascr, post in links_ref:
        src, dst = get_node(fw, fsf), get_node(tw, tsf)
        # ps_latlink_prob returns ascr << SENSCR_SHIFT; our links hold
        # shifted units
        l = LatLink(src=src, dst=dst, ef=ef, ascr=ascr / 1024.0)
        lid = len(lat.links)
        lat.links.append(l)
        lat.nodes[src].exits.append(lid)
        lat.nodes[dst].entries.append(lid)
    lat.n_frames = max(int(k[1]) for k in node_of) + 1
    lat.start = node_of[("<s>", 0)]
    lat.end = node_of[end_key]
    hyp, _, _ = lat.bestpath(lm=lm, lwf=9.5 / 6.5)
    post = lat.posterior(lm=lm, ascale=20.0)
    assert hyp == "go forward ten meters"
    ours_p = math.exp(min(post, 0.0))
    assert abs(ours_p - ref_prob) < 0.05 * ref_prob, (ours_p, ref_prob)
    bad = []
    for li, (fw, fsf, ef, tw, tsf, ascr, rp) in enumerate(links_ref):
        op = math.exp(lat.links[li].post) \
            if lat.links[li].post > NEG_ISH else 0.0
        if abs(min(op, 1.0) - min(rp, 1.0)) > 0.05:
            bad.append((fw, fsf, ef, tw, op, rp))
    assert not bad, f"{len(bad)}/{len(links_ref)}: {bad[:5]}"
