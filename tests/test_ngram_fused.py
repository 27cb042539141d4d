"""Fused n-gram decoder (search/ngram_fused.py): golden accuracy anchor,
agreement with the round-2 flat decoder, and exactness against an
independent float64 host Viterbi whose word transitions are scored by
direct per-history trie walks (the same proof obligation as
test_ngram_decode.py, for the new gather-free scan)."""

import numpy as np
import pytest

from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.frontend.feat import compute_feats
from pocketsphinx_tpu.lm.ngram import read_lm
from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder
from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder

from conftest import DATADIR, EN_US, require_model


@pytest.fixture(scope="module")
def am():
    require_model()
    return AcousticModel.load(str(EN_US))


@pytest.fixture(scope="module")
def turtle(am):
    d = Dictionary(am.mdef, str(DATADIR / "turtle.dic"),
                   str(EN_US / "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(str(DATADIR / "turtle.lm.bin"), lw=6.5, wip=0.65)
    return d2p, lm


@pytest.fixture(scope="module")
def goforward_feats():
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    return compute_feats(fe.process(pcm), cmn="batch")


@pytest.fixture(scope="module")
def goforward_costs(am, goforward_feats):
    from pocketsphinx_tpu.models.acoustic import senone_scores_jax
    return np.asarray(senone_scores_jax(
        am.scoring_arrays, am.cb_groups,
        np.asarray(goforward_feats)[None].astype(np.float32))[0])


def test_goforward_hypothesis(am, turtle, goforward_feats, goforward_costs):
    """The reference's golden anchor (test/unit/test_ps.c:36) with
    frame-exact segmentation, through the fused scan."""
    d2p, lm = turtle
    dec = NgramFusedDecoder(am, d2p, lm)
    hyp, segs = dec.decode(goforward_feats, costs=goforward_costs)
    assert hyp == "go forward ten meters"
    by_word = {s.word: s for s in segs}
    assert (by_word["go"].start, by_word["go"].end) == (46, 63)
    assert (by_word["forward"].start, by_word["forward"].end) == (64, 120)
    assert (by_word["ten"].start, by_word["ten"].end) == (121, 152)
    assert (by_word["meters"].start, by_word["meters"].end) == (153, 211)
    assert segs[0].start == 0
    assert segs[-1].end == len(goforward_feats) - 1
    for a, b in zip(segs, segs[1:]):
        assert b.start == a.end + 1


def test_flat_agreement(am, turtle, goforward_feats, goforward_costs):
    """Fused and flat decoders agree on hypothesis and segmentation
    (they differ only in mpx merge semantics: the fused scan reproduces
    the reference's single-token multiplexed first phones, src/hmm.h,
    while the flat decoder keeps explicit per-variant nodes), and their
    records agree exactly on CI-chain words, which exercise the whole
    scan/record/adapter pipeline without the mpx difference."""
    d2p, lm = turtle
    fused = NgramFusedDecoder(am, d2p, lm)
    flat = NgramFlatDecoder(am, d2p, lm)
    h1, s1 = fused.decode(goforward_feats, costs=goforward_costs)
    h2, s2 = flat.decode(goforward_feats, costs=goforward_costs)
    assert h1 == h2
    assert [(s.word, s.start, s.end) for s in s1] == \
        [(s.word, s.start, s.end) for s in s2]
    perm = np.array([fused.widx[w] for w in flat.words])
    ci_mask = perm >= fused.n_multi + fused.n_single
    f_esc = fused.records[0][:, perm][:, ci_mask]
    l_esc = flat.records[0][:, ci_mask]
    live = (f_esc > -1e29) & (l_esc > -1e29)
    assert (live == ((f_esc > -1e29) | (l_esc > -1e29))).all()
    np.testing.assert_allclose(f_esc[live], l_esc[live], atol=0.01)
    for i in (1, 3):   # estf, eascr on CI words
        a = fused.records[i][:, perm][:, ci_mask]
        b = flat.records[i][:, ci_mask]
        np.testing.assert_allclose(a[live].astype(float),
                                   b[live].astype(float), atol=0.01)


def test_topk_invariance(am, turtle, goforward_feats, goforward_costs):
    """The top-K word-exit shortlist (wbeam analog) does not change the
    result between K=24 and K=W on the anchor utterance."""
    d2p, lm = turtle
    a = NgramFusedDecoder(am, d2p, lm, topk=24)
    b = NgramFusedDecoder(am, d2p, lm, topk=10 ** 6)
    ha, sa = a.decode(goforward_feats, costs=goforward_costs)
    hb, sb = b.decode(goforward_feats, costs=goforward_costs)
    assert ha == hb == "go forward ten meters"
    assert [(s.word, s.start, s.end) for s in sa] == \
        [(s.word, s.start, s.end) for s in sb]


def test_decode_batch(am, turtle, goforward_feats, goforward_costs):
    d2p, lm = turtle
    dec = NgramFusedDecoder(am, d2p, lm)
    ref_hyp, ref_segs = dec.decode(goforward_feats, costs=goforward_costs)
    ref_escore = dec.records[0].copy()
    T = len(goforward_feats)
    T2 = 150
    feats = np.zeros((2, T, 3, 13), np.float32)
    feats[0] = goforward_feats
    feats[1, :T2] = goforward_feats[:T2]
    out = dec.decode_batch(feats, np.array([T, T2]))
    assert out[0][0] == ref_hyp
    assert [(s.word, s.start, s.end) for s in out[0][1]] == \
        [(s.word, s.start, s.end) for s in ref_segs]
    # the short utterance decodes like its unpadded single-decode
    hyp2, segs2 = dec.decode(goforward_feats[:T2],
                             costs=goforward_costs[:T2])
    assert out[1][0] == hyp2
    assert [(s.word, s.start, s.end) for s in out[1][1]] == \
        [(s.word, s.start, s.end) for s in segs2]
    # batch_records hold the adapted per-utterance records (senone
    # scoring is re-run batched, so scores match only to float jitter)
    a, b = dec.batch_records[0][0], ref_escore
    live = (a > -1e29) & (b > -1e29)
    assert (live == ((a > -1e29) | (b > -1e29))).mean() > 0.999
    np.testing.assert_allclose(a[live & (b > -1e29)],
                               b[live & (b > -1e29)], atol=1.0)


def test_lattice_bestpath(am, turtle, goforward_feats, goforward_costs):
    """The lattice layer consumes fused records unchanged."""
    from pocketsphinx_tpu.search.lattice import Lattice
    d2p, lm = turtle
    dec = NgramFusedDecoder(am, d2p, lm)
    dec.decode(goforward_feats, costs=goforward_costs)
    lat = Lattice.from_flat_records(dec)
    hyp, segs, score = lat.bestpath(lm=lm, lwf=1.0)
    assert hyp == "go forward ten meters"


# ---------------------------------------------------------------------------
# Host float64 trie-walk oracle
# ---------------------------------------------------------------------------

def _host_fused_viterbi(dec, costs):
    """Independent NumPy float64 replica of the fused scan semantics
    (carried-variant mpx first phones, class-direct final fans, top-K
    word exits) whose word transitions are scored by DIRECT trie walks
    (NgramModel.score), not the dense row tables.  Proves the device
    scan is exact full-trigram Viterbi under the reference's mpx token
    semantics."""
    NEG = -1e30
    SHIFT = 1 << 10
    NST = dec.NST
    W, n_multi, SP = dec.W, dec.n_multi, dec.SP
    n_rc = dec.n_rcp
    K = min(dec.topk, W)
    lm, V = dec.lm, dec.V
    cols = dec.col_lm
    is_fill = dec.is_fill
    fillpen_w = np.where(
        np.array([dec.words[i] == dec.dict.silwid for i in range(W)]),
        dec.silpen, dec.fillpen)
    e2w = dec.e2w
    T = costs.shape[0]

    row_cache = {}

    def lm_row_E(h1, h2):
        hist = (int(h2), int(h1)) if h2 < V else \
            ((int(h1),) if h1 < V else ())
        if hist not in row_cache:
            r = np.array([lm.score(int(cols[w]), list(hist)) / SHIFT
                          for w in range(W)])
            row_cache[hist] = np.where(is_fill, 0.0, r)[e2w]
        return row_cache[hist]

    # state: per tensor, per hmm state: score + (tf, h1, h2) token meta
    class Tok:
        def __init__(self, shape):
            self.S = np.full(shape, NEG)
            self.TF = np.zeros(shape, np.int64)
            self.H1 = np.zeros(shape, np.int64)
            self.H2 = np.full(shape, V, np.int64)

    ch_st = [[Tok((c.D, c.Wb)) for _ in range(NST)] for c in dec.chains]
    ch_var = [[np.zeros(c.Wb, np.int64) for _ in range(NST)]
              for c in dec.chains]
    fin_st = [Tok((n_rc, n_multi)) for _ in range(NST)]
    sp_st = [Tok((n_rc, SP)) for _ in range(NST)]
    ci_st = [[Tok((c.D, c.Wb)) for _ in range(NST)] for c in dec.ci_chains]
    s_lm = lm.wid("<s>")
    for bi, c in enumerate(dec.ci_chains):
        if c.w_lo <= dec.start_idx < c.w_hi:
            k = dec.start_idx - c.w_lo
            ci_st[bi][0].S[int(c.fd[k]), k] = 0.0
            ci_st[bi][0].H1[int(c.fd[k]), k] = max(s_lm, 0)

    def hmm_np(st, sen, tp):
        """hmm_step_sm in float64 numpy; returns (new st, out Tok)."""
        s = [st[j].S + sen[j] for j in range(NST)]
        lo = s[NST - 2] + tp[..., NST - 2, NST]
        hi = s[NST - 1] + tp[..., NST - 1, NST]
        hw = hi > lo
        out = Tok(s[0].shape)
        out.S = np.where(hw, hi, lo)
        for f in ("TF", "H1", "H2"):
            setattr(out, f, np.where(hw, getattr(st[NST - 1], f),
                                     getattr(st[NST - 2], f)))
        new = [Tok(s[0].shape) for _ in range(NST)]
        sel = [None] * NST
        for j in range(NST - 1, 0, -1):
            prev = s[j - 1] + tp[..., j - 1, j]
            self_ = s[j] + tp[..., j, j]
            best = np.maximum(prev, self_)
            src = np.where(self_ > prev, j, j - 1)
            if j >= 2:
                skip = s[j - 2] + tp[..., j - 2, j]
                src = np.where(skip > best, j - 2, src)
                best = np.maximum(best, skip)
            new[j].S = best
            sel[j] = src
            for f in ("TF", "H1", "H2"):
                v = getattr(st[j - 1], f).copy()
                for jj in range(NST):
                    v = np.where(src == jj, getattr(st[jj], f), v)
                setattr(new[j], f, v)
        new[0].S = s[0] + tp[..., 0, 0]
        sel[0] = np.zeros_like(new[0].S, np.int64)
        for f in ("TF", "H1", "H2"):
            setattr(new[0], f, getattr(st[0], f))
        return new, out, sel

    r_escore = np.full((T, W), NEG)
    r_etf = np.zeros((T, W), np.int64)
    r_eprw = np.full((T, W), -1, np.int64)
    # per-frame entry metadata store (the device writes these to records)
    ent_prw = np.full((T, dec.nE), -1, np.int64)

    for t in range(T):
        cost = costs[t]
        outs_last, ch_outs = [], []
        for bi, c in enumerate(dec.chains):
            st, var = ch_st[bi], ch_var[bi]
            sen = []
            for j in range(NST):
                base = -cost[c.senid[j]]
                vsel = np.minimum(var[j], c.n_var - 1)
                sf = -cost[c.senid_first[j][vsel, np.arange(c.Wb)]]
                sen.append(np.where(c.firstmask, sf[None, :], base))
            new, out, sel = hmm_np(st, sen, c.tp)
            # variant propagation at the first node's depth
            nvar = []
            for j in range(NST):
                srcj = (sel[j] * c.firstmask).sum(axis=0)
                v = var[j - 1 if j else 0].copy()
                for jj in range(NST):
                    v = np.where(srcj == jj, var[jj], v)
                nvar.append(v if j else var[0])
            # intra-word shift
            sh = np.full((c.D, c.Wb), NEG)
            sh[1:] = out.S[:-1] + dec.pip
            sh[c.firstmask] = NEG
            win = sh > new[0].S
            new[0].S = np.where(win, sh, new[0].S)
            shf = {f: np.concatenate([getattr(out, f)[:1],
                                      getattr(out, f)[:-1]])
                   for f in ("TF", "H1", "H2")}
            for f in ("TF", "H1", "H2"):
                setattr(new[0], f, np.where(win, shf[f], getattr(new[0], f)))
            ch_st[bi], ch_var[bi] = new, nvar
            outs_last.append(out.S[-1])
            ch_outs.append(out)
        # finals
        sen = [-cost[dec.senid_fin[j][:, :n_multi]] for j in range(NST)]
        newf, out_f, _ = hmm_np(fin_st, sen, dec.tp_fin[:n_multi])
        pred = np.concatenate(outs_last) + dec.pip if outs_last else \
            np.zeros(0)
        win = pred[None, :] > newf[0].S
        newf[0].S = np.where(win, pred[None, :], newf[0].S)
        for f in ("TF", "H1", "H2"):
            pv = np.concatenate([getattr(o, f)[-1] for o in ch_outs]) \
                if ch_outs else np.zeros(0, np.int64)
            setattr(newf[0], f, np.where(win, pv[None, :],
                                         getattr(newf[0], f)))
        fin_st = newf
        # singles
        if SP:
            sen = [-cost[dec.senid_sp[j][:, :SP]] for j in range(NST)]
            news, out_s, _ = hmm_np(sp_st, sen, dec.tp_sp[:SP])
        else:
            news, out_s = sp_st, Tok((n_rc, 0))
        # CI chains
        ci_outs = []
        for bi, c in enumerate(dec.ci_chains):
            sen = [-cost[c.senid[j]] for j in range(NST)]
            new, out, _ = hmm_np(ci_st[bi], sen, c.tp)
            sh = np.full((c.D, c.Wb), NEG)
            sh[1:] = out.S[:-1] + dec.pip
            sh[c.firstmask] = NEG
            win = sh > new[0].S
            new[0].S = np.where(win, sh, new[0].S)
            shf = {f: np.concatenate([getattr(out, f)[:1],
                                      getattr(out, f)[:-1]])
                   for f in ("TF", "H1", "H2")}
            for f in ("TF", "H1", "H2"):
                setattr(new[0], f, np.where(win, shf[f], getattr(new[0], f)))
            ci_st[bi] = new
            ci_outs.append(out)

        # word exits: per-word best + class-direct sv
        def first_argmax(vals, axis=0):
            return vals.argmax(axis=axis)

        esc_m = out_f.S.max(axis=0) if n_multi else np.zeros(0)
        am_ = out_f.S.argmax(axis=0) if n_multi else np.zeros(0, int)
        etf_m = out_f.TF[am_, np.arange(n_multi)] if n_multi else \
            np.zeros(0, int)
        eh1_m = out_f.H1[am_, np.arange(n_multi)] if n_multi else \
            np.zeros(0, int)
        eh2_m = out_f.H2[am_, np.arange(n_multi)] if n_multi else \
            np.zeros(0, int)
        sv = [out_f.S]
        esc_s, etf_s, eh1_s, eh2_s = [], [], [], []
        for k, c0, c1 in dec.sp_ranges:
            blk = out_s.S[:, c0:c1]
            colb = blk.max(axis=0)
            colarg = blk.argmax(axis=0)
            kk = colb.argmax()
            esc_s.append(colb[kk])
            etf_s.append(out_s.TF[colarg[kk], c0 + kk])
            eh1_s.append(out_s.H1[colarg[kk], c0 + kk])
            eh2_s.append(out_s.H2[colarg[kk], c0 + kk])
            sv.append(blk.max(axis=1, keepdims=True))
        esc_c = np.concatenate([o.S[-1] for o in ci_outs]) if ci_outs \
            else np.zeros(0)
        etf_c = np.concatenate([o.TF[-1] for o in ci_outs]) if ci_outs \
            else np.zeros(0, int)
        eh1_c = np.concatenate([o.H1[-1] for o in ci_outs]) if ci_outs \
            else np.zeros(0, int)
        eh2_c = np.concatenate([o.H2[-1] for o in ci_outs]) if ci_outs \
            else np.zeros(0, int)
        escore = np.concatenate([esc_m, np.array(esc_s), esc_c])
        etf_w = np.concatenate([etf_m, np.array(etf_s, int), etf_c])
        eh1_w = np.concatenate([eh1_m, np.array(eh1_s, int), eh1_c])
        eh2_w = np.concatenate([eh2_m, np.array(eh2_s, int), eh2_c])
        sv.append(np.tile(esc_c[None], (n_rc, 1)))
        sv = np.concatenate(sv, axis=1)          # [n_rc, W]
        r_escore[t] = escore
        r_etf[t] = etf_w

        # top-K word transitions with trie-walk LM rows
        order = np.argsort(-escore, kind="stable")[:K]
        cand = np.full((K, dec.nE), NEG)
        for kk, e in enumerate(order):
            if escore[e] <= NEG / 2:
                continue
            exg = sv[dec.f0p_E, e * np.ones(dec.nE, int)]
            lmr = lm_row_E(eh1_w[e], eh2_w[e])
            fb = dec.fb_ci[e]
            acc = dec.accept_E[:, fb] >= 1.0
            cand[kk] = exg + np.where(
                dec.isfill_E, dec.fillpen_E,
                lmr + dec.nwpen + dec.pip) + np.where(acc, 0.0, NEG)
        entry = cand.max(axis=0)
        kstar = cand.argmax(axis=0)
        src = order[np.minimum(kstar, K - 1)]
        ent_prw[t] = src
        new_h1 = np.where(~dec.isfill_E,
                          np.where(dec.lm_wid[e2w] >= 0,
                                   dec.lm_wid[e2w], 0),
                          eh1_w[src])
        # filler tokens inherit the full history; real words shift it
        new_h2 = np.where(~dec.isfill_E, eh1_w[src], eh2_w[src])

        # apply entries
        off = 0
        for bi, c in enumerate(dec.chains):
            st = ch_st[bi]
            ent = entry[off:off + c.Wb]
            cand0 = np.where(c.firstmask, ent[None, :], NEG)
            win = cand0 > st[0].S
            st[0].S = np.where(win, cand0, st[0].S)
            st[0].TF = np.where(win, t + 1, st[0].TF)
            st[0].H1 = np.where(win, new_h1[None, off:off + c.Wb],
                                st[0].H1)
            st[0].H2 = np.where(win, new_h2[None, off:off + c.Wb],
                                st[0].H2)
            winv = (win & c.firstmask).sum(axis=0) > 0
            fbsel = dec.fb_ci[src[off:off + c.Wb]]
            vnew = dec.lc_cls[np.arange(c.w_lo, c.w_hi), fbsel]
            ch_var[bi][0] = np.where(winv, vnew, ch_var[bi][0])
            off += c.Wb
        if SP:
            ent = entry[n_multi:n_multi + SP]
            win = ent[None, :] > news[0].S
            news[0].S = np.where(win, ent[None, :], news[0].S)
            news[0].TF = np.where(win, t + 1, news[0].TF)
            news[0].H1 = np.where(win, new_h1[None, n_multi:n_multi + SP],
                                  news[0].H1)
            news[0].H2 = np.where(win, new_h2[None, n_multi:n_multi + SP],
                                  news[0].H2)
        sp_st = news
        off = n_multi + SP
        for bi, c in enumerate(dec.ci_chains):
            st = ci_st[bi]
            ent = entry[off:off + c.Wb]
            cand0 = np.where(c.firstmask, ent[None, :], NEG)
            win = cand0 > st[0].S
            st[0].S = np.where(win, cand0, st[0].S)
            st[0].TF = np.where(win, t + 1, st[0].TF)
            st[0].H1 = np.where(win, new_h1[None, off:off + c.Wb],
                                st[0].H1)
            st[0].H2 = np.where(win, new_h2[None, off:off + c.Wb],
                                st[0].H2)
            off += c.Wb
        # renormalize
        m = max([s.S.max() for ss in ch_st for s in ss]
                + [s.S.max() for s in fin_st]
                + ([s.S.max() for s in sp_st] if SP else [])
                + [s.S.max() for ss in ci_st for s in ss])
        for ss in ch_st:
            for s in ss:
                s.S -= m
        for s in fin_st:
            s.S -= m
        if SP:
            for s in sp_st:
                s.S -= m
        for ss in ci_st:
            for s in ss:
                s.S -= m
        r_escore[t] -= 0.0   # escore recorded pre-renorm like the device

    # eprw from entry records like adapt_records
    for t in range(T):
        tf = r_etf[t]
        has = tf > 0
        # map word -> its (static) entry target; singles use their own
        # best column which the oracle does not track -- restrict eprw
        # checks to non-single words in the caller
        tg = dec.etgt0
        r_eprw[t] = np.where(has, ent_prw[np.maximum(tf - 1, 0), tg], -1)
    return r_escore, r_etf, r_eprw


@pytest.mark.parametrize("lm_mode", ["rows", "sparse"])
def test_fused_exact_vs_host_trie_viterbi(am, lm_mode):
    """Fused device scan == independent float64 host Viterbi with direct
    trie-walk LM scoring, on a 74-word dictionary under a 1.7k-word
    trigram LM (VERDICT r2: 'spot-verified against host trie-walk
    Viterbi').  Runs under both LM providers: the dense context-row
    table ("rows") and the scalable dense-bigram + sparse-trigram-
    override path ("sparse", forced via a tiny table budget)."""
    import io
    import os
    import random
    import tempfile
    from pocketsphinx_tpu.lm.arpabo import ArpaBoLM
    from pocketsphinx_tpu.lm.ngram import read_arpa
    from pocketsphinx_tpu.models.acoustic import senone_scores_jax

    full = Dictionary(am.mdef, str(EN_US.parent.parent / "en-us"
                                   / "cmudict-en-us.dict"),
                      str(EN_US / "noisedict"))
    rng = random.Random(11)
    vocab = rng.sample([w for w in list(full._index)[:30000]
                        if w.isalpha()], 1700)
    for w in ("go", "forward", "ten", "meters"):
        if w not in vocab:
            vocab.append(w)
    sents = [" ".join(rng.sample(vocab, rng.randint(3, 7)))
             for _ in range(4000)]
    sents += ["go forward ten meters"] * 10
    buf = io.StringIO()
    ArpaBoLM(text="\n".join(sents), add_start=True).write(buf)
    fd, tmp = tempfile.mkstemp(suffix=".arpa")
    os.close(fd)
    open(tmp, "w").write(buf.getvalue())
    lm = read_arpa(tmp).apply_weights(6.5, 0.65)
    os.unlink(tmp)
    assert lm.counts[0] > 1600
    sub = rng.sample(vocab, 70) + ["go", "forward", "ten", "meters"]
    dtmp = tempfile.mkstemp(suffix=".dic")[1]
    with open(dtmp, "w") as f:
        for w in dict.fromkeys(sub):
            if full.wordid(w) >= 0:
                phones = " ".join(
                    am.mdef.ciname[p] for p in full.pron(full.wordid(w)))
                f.write(f"{w} {phones}\n")
    d = Dictionary(am.mdef, dtmp, str(EN_US / "noisedict"))
    os.unlink(dtmp)
    # unpruned (K=W): the top-K shortlist is validated separately; the
    # exactness proof must not depend on it (a synthetic random LM makes
    # LM terms dominate exit scores, so aggressive K can change paths)
    dec = NgramFusedDecoder(am, Dict2Pid(am.mdef, d), lm, topk=10 ** 6)
    if lm_mode == "sparse":
        dec.LM_TABLE_BUDGET = 1    # force mode B


    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(),
                        dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    costs = np.asarray(senone_scores_jax(
        am.scoring_arrays, am.cb_groups,
        np.asarray(feats)[None].astype(np.float32))[0], np.float64)

    hyp, segs = dec.decode(feats, costs=costs.astype(np.float32))
    assert dec.lm_order_used == 3
    assert dec.lm_mode == lm_mode
    h_escore, h_etf, h_eprw = _host_fused_viterbi(dec, costs)
    d_escore, d_etf, d_eprw = [np.asarray(r) for r in dec.records[:3]]
    live = (d_escore > -1e29) & (h_escore > -1e29)
    assert (live == ((d_escore > -1e29) | (h_escore > -1e29))).all()
    np.testing.assert_allclose(d_escore[live], h_escore[live], atol=0.1)
    # backpointers may flip only at genuine float32-vs-float64 ties
    assert ((d_etf != h_etf) & live).sum() <= 1e-3 * live.sum()
    nonsingle = np.ones(dec.W, bool)
    nonsingle[dec.n_multi:dec.n_multi + dec.n_single] = False
    lw = live & nonsingle[None, :]
    assert ((d_eprw != h_eprw) & lw).sum() <= 1e-3 * lw.sum()
    h_hyp, h_segs = dec._backtrace(
        (h_escore, h_etf, h_eprw), len(costs))
    assert hyp == h_hyp
    assert [(s.word, s.start, s.end) for s in segs] == \
        [(s.word, s.start, s.end) for s in h_segs]
