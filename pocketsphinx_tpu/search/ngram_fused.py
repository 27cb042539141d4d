"""N-gram decoding v3: gather-free fused Viterbi scan ("ngram_fused").

TPU-first redesign of the round-2 dense flat decoder (ngram_flat.py),
built from measured TPU cost rules (docs/PERF_NOTES.md): inside a
`lax.scan` body, element gathers/scatters run ~200-600x slower than the
same op outside a loop, while elementwise chains, static slices,
reductions, `top_k`, small matmuls and row-sized `dynamic_slice`s are
fast.  Round 2's per-frame `[W, W]` element-gathers (`sv[exit_slot]`,
`lm_rows[ectx]`) were 99.6% of runtime; this module eliminates every
in-scan element gather:

  * **Right-aligned chain tensors.**  First + interior phones of every
    word live in `[3, D, W]` length-bucketed tensors, each word's chain
    right-aligned so its last node sits at depth D-1.  The intra-word
    Viterbi "token passing" (src/hmm.c:222-350 semantics via
    ops/hmm.py:hmm_step_sm) becomes a shift along the depth axis; word
    entries apply through a static first-depth mask.  No successor
    indices exist at all.
  * **Carried-variant mpx first phones.**  The reference's multiplexed
    channels (src/hmm.h mpx, src/ngram_search_fwdtree.c:1241-1310) are
    reproduced exactly: one first-phone node per word whose per-state
    senone follows the token's left-context class, carried as a VAR
    metadata plane and resolved against pre-gathered per-variant senone
    scores by a masked sum (no gather).
  * **Class-direct final fans.**  The word-final right-context fan
    (dict2pid xwdssid, src/dict2pid.c) is a `[3, n_rc, W]` tensor whose
    plane axis *is* the right-context CI phone (restricted to contexts
    that can occur: word-initial phones + SIL).  Exit scores per
    (word, right context) are direct slices.
  * **Top-K exits + one-hot matmuls.**  Word transitions process the K
    best word exits per frame (the analog of the reference's wbeam
    word-exit prune, src/ngram_search_fwdtree.c:1130-1238): per-exit LM
    successor rows are fetched as K row-sized `dynamic_slice`s from the
    dense context-row table (exact trigram; lm/ngram.py
    dense_context_rows), and all cross-indexing (exit-class selection,
    per-K payloads, left-class assignment) is done with small one-hot
    matmuls and first-argmax masked sums -- MXU/VPU work, no gathers.
  * **Token metadata off the carry.**  Tokens carry only (score, entry
    frame TF, LM context row CTX) [+ VAR on first phones]; everything
    else (predecessor word, history words, entry score) is written once
    per entry event to the per-frame records and re-joined on the host
    (`adapt_records`), which reconstructs the exact round-2 record
    format consumed by the lattice layer and backtrace.

Exactness contract: same trigram Katz scoring as the reference's
fwdflat pass (src/ngram_search_fwdflat.c:813 via ngram_tg_score), same
mpx/tie semantics, proven against a host float64 trie-walk oracle in
tests/test_ngram_fused.py.  The top-K shortlist is the only pruning;
K >= W disables it (tests decode both ways and compare).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

from ..models.dict2pid import Dict2Pid
from ..models.acoustic import AcousticModel, UNIT_NATS
from ..lm.ngram import NgramModel
from .ngram_flat import Seg, NEG_INF, SHIFT

BIG_NEG = np.float32(-1e30)


@dataclass
class _Chain:
    """One right-aligned chain bucket: words [w_lo, w_hi) with padded
    depth D (covers first + interior phones; finals live elsewhere for
    real words, in-chain for CI-filler chains)."""

    w_lo: int
    w_hi: int
    D: int
    senid: np.ndarray = None          # [3, D, Wb] int32
    tp: np.ndarray = None             # [D, Wb, NST, NST+1] f32
    fd: np.ndarray = None             # [Wb] first depth per word
    firstmask: np.ndarray = None      # [D, Wb] bool
    # mpx first-phone variants (real multi-phone words only)
    senid_first: np.ndarray = None    # [3, RF, Wb] int32
    n_var: np.ndarray = None          # [Wb]
    RF: int = 0

    @property
    def Wb(self):
        return self.w_hi - self.w_lo


class _LazyBatchRecords:
    """List-like view of per-utterance adapted records that transfers
    and joins a batch's raw device records only for the utterances a
    consumer (outlatdir, tests) actually indexes."""

    def __init__(self, dec, raw_dev, nf):
        self._dec = dec
        self._raw = raw_dev      # tuple of [B, T, ...] device arrays
        self._nf = nf
        self._cache = {}

    def __len__(self):
        return len(self._nf)

    def __getitem__(self, b):
        if b not in self._cache:
            per_utt = tuple(np.asarray(r[b]) for r in self._raw)
            self._cache[b] = self._dec.adapt_records(
                per_utt, int(self._nf[b]))
        return self._cache[b]

    def __iter__(self):
        return (self[b] for b in range(len(self)))


class NgramFusedDecoder:
    """Exact-trigram full-vocabulary Viterbi with a gather-free scan."""

    LM_TABLE_BUDGET = None   # default: env PS_LM_TABLE_BYTES or 2 GiB
    #: senone pre-gather chunk (frames); env PS_NGRAM_CHUNK overrides
    #: (read at scan-build time in _make_scan, like the other PS_*
    #: knobs).  16 measured ~6% faster than 8 at the 20k config (fewer
    #: outer scan iterations / launch overhead; docs/PERF_NOTES.md)
    CHUNK = 16

    def __init__(self, am: AcousticModel, d2p: Dict2Pid, lm: NgramModel,
                 silprob: float = 0.005, fillprob: float = 1e-8,
                 pip: float = 1.0, nwpen: float = 1.0,
                 topk: int | None = None,
                 depth_buckets: tuple | None = None):
        self.am = am
        self.d2p = d2p
        self.dict = d2p.dict
        self.lm = lm
        self.mdef = am.mdef
        ln = lambda p: math.log(p) / UNIT_NATS  # shifted units
        self.pip = ln(pip)
        self.nwpen = ln(nwpen)
        self.silpen = self.pip + ln(silprob)
        self.fillpen = self.pip + ln(fillprob)
        self.topk = topk
        if self.topk is None:
            self.topk = int(os.environ.get("PS_NGRAM_TOPK", "96"))
        # Depth-bucket quantization: FEW buckets (default: one per word
        # class) so the per-frame step compiles to few large fused
        # kernels.  TPU step cost is dominated by kernel count, not
        # element count (docs/PERF_NOTES.md): round 3's original 12-way
        # bucketing spent ~7us of launch overhead per tiny kernel.
        if depth_buckets is None:
            env = os.environ.get("PS_NGRAM_DEPTHS")
            depth_buckets = (tuple(int(x) for x in env.split(","))
                             if env else ())
        self.depth_buckets = tuple(depth_buckets)
        self._build()

    # -- static structure ----------------------------------------------------

    def _select_words(self):
        """Word list identical in membership to ngram_flat._build, but
        reordered [multi (by length) | single-phone | CI chains]."""
        d, lm, mdef = self.dict, self.lm, self.mdef
        sil = mdef.sil
        picked = []                 # (class, sortkey, wid, lm_wid, fill)
        for wid in range(len(d)):
            base = d.basestr(wid)
            lw = lm.wid(base)
            pron = [int(x) for x in d.pron(wid)]
            is_ci = d.is_filler(wid) or (len(pron) == 1 and pron[0] == sil)
            if d.is_filler(wid) and wid not in (d.startwid, d.finishwid):
                picked.append((2, len(pron), wid, -1, True))
            elif lw >= 0:
                cls = 2 if is_ci else (1 if len(pron) == 1 else 0)
                picked.append((cls, len(pron), wid, lw, False))
        picked.sort(key=lambda t: (t[0], t[1], t[2]))
        self.words = [t[2] for t in picked]
        self.lm_wid = np.array([t[3] for t in picked], np.int32)
        self.is_fill = np.array([t[4] for t in picked], bool)
        self.W = len(picked)
        self.widx = {w: i for i, w in enumerate(self.words)}
        self.n_multi = sum(1 for t in picked if t[0] == 0)
        self.n_single = sum(1 for t in picked if t[0] == 1)
        self.n_ci = self.W - self.n_multi - self.n_single

    def _depth_for(self, length_minus: int) -> int:
        for d in self._depth_buckets:
            if length_minus <= d:
                return d
        return length_minus

    def _build(self):
        self._scan_fn = {}
        self._bt_fn = {}
        self._dev_tables = None
        self._lm_rows = None
        self.lm_mode = None
        d, mdef, d2p = self.dict, self.mdef, self.d2p
        sseq = mdef.sseq
        tmat_tp = self.am.tmat.tp      # [n_tmat, NST, NST+1] uint8
        NST = mdef.n_emit_state
        self.NST = NST
        sil = mdef.sil
        self._select_words()
        W, n_multi, n_single = self.W, self.n_multi, self.n_single
        prons = [[int(x) for x in d.pron(w)] for w in self.words]

        def tp_of(ci):
            t = tmat_tp[mdef.phone_tmat[ci]].astype(np.float32)
            return np.where(t == 255, NEG_INF, -t)

        # resolve depth buckets: empty tuple = automatic.  Small W: one
        # bucket per class (TPU step cost is kernel-count-bound, see
        # _depth_buckets note below).  Large W: the chain tensors get
        # element-count-bound instead — a single bucket pads every word
        # to the longest chain (~3x waste at 20k cmudict words), so
        # quantile buckets of the length distribution win (measured
        # -14%/step at 20k with 4 buckets).
        self._depth_buckets = self.depth_buckets
        if not self._depth_buckets:
            need = [len(d.pron(w)) - 1 for w in self.words[:n_multi]] \
                + [len(d.pron(w))
                   for w in self.words[n_multi + n_single:]]
            if not need:
                self._depth_buckets = (1,)
            elif n_multi <= 4000:
                self._depth_buckets = (max(need),)
            else:
                qs = np.quantile(np.array(need), [0.4, 0.75, 0.92, 1.0])
                self._depth_buckets = tuple(sorted(
                    {int(q) for q in qs} | {max(need)}))

        # occurring right contexts: word-initial phones + SIL
        rc_set = sorted({p[0] for p in prons} | {sil})
        self.rc_list = np.array(rc_set, np.int32)
        n_rc = len(rc_set)
        self.n_rcp = n_rc
        rc_plane = np.full(mdef.n_ciphone, -1, np.int32)
        rc_plane[rc_set] = np.arange(n_rc)
        self.f0_plane = np.array([rc_plane[p[0]] for p in prons], np.int32)
        self.fb_ci = np.array([p[-1] for p in prons], np.int32)

        # ---- multi-phone words: chain buckets + finals fan ----
        chains: list[_Chain] = []
        lo = 0
        while lo < n_multi:
            D = self._depth_for(len(prons[lo]) - 1)
            hi = lo
            while hi < n_multi and self._depth_for(len(prons[hi]) - 1) == D:
                hi += 1
            chains.append(_Chain(w_lo=lo, w_hi=hi, D=D))
            lo = hi
        lc_cls = np.zeros((n_multi, mdef.n_ciphone), np.int32)
        for ch in chains:
            Wb, D = ch.Wb, ch.D
            senid = np.zeros((NST, D, Wb), np.int32)
            tp = np.tile(tp_of(sil)[None, None], (D, Wb, 1, 1))
            fd = np.zeros(Wb, np.int64)
            nvar = np.ones(Wb, np.int64)
            RF = 1
            var_ssids = []
            for k in range(Wb):
                pron = prons[ch.w_lo + k]
                L = len(pron)
                fd[k] = D - (L - 1)
                uniq = np.unique(d2p.ldiph_lc[pron[0], pron[1]])
                var_ssids.append(uniq)
                nvar[k] = len(uniq)
                RF = max(RF, len(uniq))
                inv = np.searchsorted(uniq, d2p.ldiph_lc[pron[0], pron[1]])
                lc_cls[ch.w_lo + k] = inv
                senid[:, fd[k], k] = sseq[int(uniq[0])]
                tp[fd[k], k] = tp_of(pron[0])
                internal = d2p.internal_ssids(self.words[ch.w_lo + k])
                for j in range(1, L - 1):
                    senid[:, fd[k] + j, k] = sseq[int(internal[j - 1])]
                    tp[fd[k] + j, k] = tp_of(pron[j])
            senid_first = np.zeros((NST, RF, Wb), np.int32)
            for k in range(Wb):
                u = var_ssids[k]
                for v in range(RF):
                    senid_first[:, v, k] = sseq[int(u[min(v, len(u) - 1)])]
            ch.senid, ch.tp, ch.fd = senid, tp, fd
            ch.firstmask = (np.arange(ch.D)[:, None] == fd[None, :])
            ch.senid_first, ch.n_var, ch.RF = senid_first, nvar, RF
            # Shared per-first-diphone variant planes: the variant ssid
            # set is a function of (p0, p1) alone (ldiph_lc[p0][p1],
            # src/dict2pid.c), so the per-frame senone pre-gather only
            # needs one plane per DISTINCT first diphone; expansion to
            # words is an exact one-hot f32 matmul on the MXU.  Cuts
            # the dominant pre-gather terms ~30x at 20k words
            # (docs/PERF_NOTES.md N_flat table).
            bpairs = [(prons[ch.w_lo + k][0], prons[ch.w_lo + k][1])
                      for k in range(Wb)]
            fd_list = sorted(set(bpairs))
            fd_of = {p: i for i, p in enumerate(fd_list)}
            n_fd = len(fd_list)
            senid_first_d = np.zeros((NST, RF, n_fd), np.int32)
            for fi, (a, b) in enumerate(fd_list):
                u = np.unique(d2p.ldiph_lc[a, b])
                for v in range(RF):
                    senid_first_d[:, v, fi] = \
                        sseq[int(u[min(v, len(u) - 1)])]
            fd_onehot = np.zeros((n_fd, Wb), np.float32)
            for k, p_ in enumerate(bpairs):
                fd_onehot[fd_of[p_], k] = 1.0
            ch.senid_first_d, ch.fd_onehot = senid_first_d, fd_onehot
        self.chains = chains
        self.lc_cls = lc_cls

        # finals fan [3, n_rc, n_multi]
        senid_fin = np.zeros((NST, n_rc, max(n_multi, 1)), np.int32)
        tp_fin = np.tile(tp_of(sil)[None], (max(n_multi, 1), 1, 1))
        for k in range(n_multi):
            pron = prons[k]
            ss = d2p.rdiph_rc[pron[-1], pron[-2]][rc_set]
            senid_fin[:, :, k] = sseq[ss.astype(np.int64)].T
            tp_fin[k] = tp_of(pron[-1])
        self.senid_fin, self.tp_fin = senid_fin, tp_fin
        # shared per-final-diphone fan planes (rdiph_rc[last, penult] is
        # a function of the final diphone alone; same sharing trick as
        # senid_first_d above)
        lp_pairs = [(prons[k][-1], prons[k][-2]) for k in range(n_multi)]
        lp_list = sorted(set(lp_pairs))
        lp_of = {p: i for i, p in enumerate(lp_list)}
        n_lp = max(len(lp_list), 1)
        senid_fin_d = np.zeros((NST, n_rc, n_lp), np.int32)
        for li_, (a, b) in enumerate(lp_list):
            ss = d2p.rdiph_rc[a, b][rc_set]
            senid_fin_d[:, :, li_] = sseq[ss.astype(np.int64)].T
        lp_onehot = np.zeros((n_lp, max(n_multi, 1)), np.float32)
        for k, p_ in enumerate(lp_pairs):
            lp_onehot[lp_of[p_], k] = 1.0
        self.senid_fin_d, self.lp_onehot = senid_fin_d, lp_onehot
        # per-word final-diphone index (pallas fan kernel expansion)
        self.lp_idx = np.array([lp_of[p_] for p_ in lp_pairs],
                               np.int32) if n_multi else \
            np.zeros(0, np.int32)

        # ---- single-phone real words: explicit (lc-class) columns ----
        # Rectangular layout: every single word owns exactly Cmax
        # columns (dead pad columns accept no left context and stay at
        # NEG_INF), so the per-word exit reduction in the scan is ONE
        # vectorized [Cmax, n_single] argmax instead of a Python loop of
        # per-word reductions (kernel-count, see _depth_buckets note).
        word_variants = []    # (word index, uniq ssid-rows, inv)
        Cmax = 1
        for k in range(n_multi, n_multi + n_single):
            p0 = prons[k][0]
            table = d2p.lrdiph_rc[p0]
            uniq, inv = np.unique(table, axis=0, return_inverse=True)
            word_variants.append((k, uniq, inv))
            Cmax = max(Cmax, len(uniq))
        sp_cols = []          # (word index, variant, rep lc, live)
        accept_sp = []        # [n_ci] bool per column
        for k, uniq, inv in word_variants:
            for v in range(Cmax):
                if v < len(uniq):
                    rep = int(np.nonzero(inv == v)[0][0])
                    sp_cols.append((k, v, rep))
                    accept_sp.append(inv == v)
                else:
                    sp_cols.append((k, 0, int(np.nonzero(inv == 0)[0][0])))
                    accept_sp.append(np.zeros(mdef.n_ciphone, bool))
        SP = len(sp_cols)
        self.SP = SP
        self.sp_cmax = Cmax
        senid_sp = np.zeros((NST, n_rc, max(SP, 1)), np.int32)
        tp_sp = np.tile(tp_of(sil)[None], (max(SP, 1), 1, 1))
        col_word = np.zeros(max(SP, 1), np.int64)
        for c, (k, v, rep) in enumerate(sp_cols):
            p0 = prons[k][0]
            ss = d2p.lrdiph_rc[p0, rep][rc_set]
            senid_sp[:, :, c] = sseq[ss.astype(np.int64)].T
            tp_sp[c] = tp_of(p0)
            col_word[c] = k
        self.senid_sp, self.tp_sp, self.sp_col_word = senid_sp, tp_sp, col_word
        self.accept_sp = (np.stack(accept_sp)
                          if SP else np.zeros((0, mdef.n_ciphone), bool))
        # column ranges per single word (rectangular: width Cmax each)
        self.sp_ranges = [(n_multi + i, i * Cmax, (i + 1) * Cmax)
                          for i in range(n_single)]

        # ---- CI chains (fillers, <s>, </s>) ----
        ci0 = n_multi + n_single
        ci_chains: list[_Chain] = []
        lo = ci0
        while lo < W:
            D = self._depth_for(len(prons[lo]))
            hi = lo
            while hi < W and self._depth_for(len(prons[hi])) == D:
                hi += 1
            ci_chains.append(_Chain(w_lo=lo, w_hi=hi, D=D))
            lo = hi
        for ch in ci_chains:
            Wb, D = ch.Wb, ch.D
            senid = np.zeros((NST, D, Wb), np.int32)
            tp = np.tile(tp_of(sil)[None, None], (D, Wb, 1, 1))
            fd = np.zeros(Wb, np.int64)
            for k in range(Wb):
                pron = prons[ch.w_lo + k]
                L = len(pron)
                fd[k] = D - L
                for j, ci in enumerate(pron):
                    senid[:, fd[k] + j, k] = sseq[int(mdef.phone_ssid[ci])]
                    tp[fd[k] + j, k] = tp_of(ci)
            ch.senid, ch.tp, ch.fd = senid, tp, fd
            ch.firstmask = (np.arange(D)[:, None] == fd[None, :])
        self.ci_chains = ci_chains

        # ---- entry-target axis E = [multi | single cols | ci words] ----
        nE = n_multi + SP + self.n_ci
        self.nE = nE
        e2w = np.concatenate([
            np.arange(n_multi, dtype=np.int64),
            col_word[:SP],
            np.arange(ci0, W, dtype=np.int64)])
        self.e2w = e2w
        self.isfill_E = self.is_fill[e2w]
        self.f0p_E = self.f0_plane[e2w]
        fillpen_w = np.where(
            np.array([self.words[i] == d.silwid for i in range(W)]),
            self.silpen, self.fillpen).astype(np.float32)
        self.fillpen_E = fillpen_w[e2w]
        # accept matrix: 1 everywhere except single columns (lc class)
        acc = np.ones((nE, mdef.n_ciphone), np.float32)
        if SP:
            acc[n_multi:n_multi + SP] = self.accept_sp.astype(np.float32)
        self.accept_E = acc
        self.lmwid_E = np.where(self.lm_wid[e2w] >= 0,
                                self.lm_wid[e2w], 0).astype(np.int64)

        # per-word static exit-target index (E index of the word's
        # chain/fan; singles are resolved at runtime to the winning col)
        etgt0 = np.zeros(W, np.int64)
        etgt0[:n_multi] = np.arange(n_multi)
        for k, c0, c1 in self.sp_ranges:
            etgt0[k] = n_multi + c0
        etgt0[ci0:] = n_multi + SP + np.arange(W - ci0)
        self.etgt0 = etgt0

        self.col_lm = np.where(self.lm_wid >= 0, self.lm_wid, 0)
        self.V = self.lm.counts[0]
        self.start_idx = (self.widx.get(d.startwid)
                          if d.startwid in self.widx else None)
        self.finish_idx = (self.widx.get(d.finishwid)
                           if d.finishwid in self.widx else None)
        # diagnostics: padded node count of the dense network
        self.P = int(sum(ch.D * ch.Wb for ch in chains + ci_chains)
                     + n_rc * (n_multi + SP))

    # -- LM tables -----------------------------------------------------------

    def _lm_tables(self):
        """(rows [R, E] f32, ctx_next [V+1, E] f32, ctx2h1 [R] i32).

        rows[r, e] = exact weighted Katz score of entry target e's word
        under history class r (r = 0 empty, 1+h unigram context h,
        1+V+b bigram-entry context b; lm/ngram.py dense_context_rows).
        ctx_next[h1, e] = context row carried after entering e's word
        with previous real word h1.  ctx2h1[r] = newest history word of
        class r (V for the empty class)."""
        if getattr(self, "lm_mode", None) is not None:
            return (self._lm_rows, self._ctx_next, self._ctx2h1,
                    self._ctx2h2)
        lm, V = self.lm, self.V
        budget = self.LM_TABLE_BUDGET
        if budget is None:
            budget = int(os.environ.get("PS_LM_TABLE_BYTES", 2 << 30))
        cols_E = self.col_lm[self.e2w]
        n_bg = lm.counts[1] if lm.order >= 2 else 0
        R = 1 + V + n_bg
        # Exactness bound: LM context ids (1+V+n_bg), word ids and entry
        # targets ride as f32 payload columns / one-hot matmul payloads
        # in the scan, which is exact only for integers < 2^24.  Refuse
        # loudly rather than silently corrupt contexts/backtraces.
        if R >= (1 << 24) or self.nE >= (1 << 24):
            raise ValueError(
                f"LM too large for the fused scan's f32 payload channels:"
                f" 1+V+n_bigrams={R}, E={self.nE} must be < 2^24 for"
                f" exact f32 integer arithmetic (ngram_fused payload"
                f" matmuls). Use a smaller LM or shard the model.")
        force = os.environ.get("PS_LM_MODE")
        sparse_budget = int(os.environ.get("PS_LM_SPARSE_BYTES", 6 << 30))
        if force == "rows":
            pass
        elif force == "csr" or (force != "sparse"
                                and lm.order >= 3 and n_bg
                                and R * self.nE * 4 > budget
                                and 2 * (V + 1) * self.nE * 4
                                > sparse_budget):
            # mode C (reference scale): FULLY sparse — even mode B's
            # dense [V+1, E] bigram + context tables are O(V*E) ~ 75 GB
            # at 135k words.  Base row = unigram + history backoff;
            # explicit bigrams/contexts overlay via per-history CSR
            # scatters in-scan; histories with giant fanout (<s>) get
            # dense "fat" rows; trigram corrections as in mode B.
            return self._lm_tables_csr(cols_E)
        if lm.order < 3 or n_bg == 0 or (
                force != "sparse" and R * self.nE * 4 <= budget):
            # mode A: one dense successor row per history class
            self.lm_mode = "rows"
            rows, with_tri = lm.dense_context_rows(cols_E, budget)
            rows = rows / SHIFT
            rows[:, self.isfill_E] = 0.0
            self.lm_order_used = 3 if with_tri else \
                (2 if lm.order >= 2 else 1)
            R = rows.shape[0]
        else:
            # mode B (scale): dense bigram rows [V+1, E] + sparse
            # per-context trigram overrides -- exact trigram at
            # O(V*E) memory instead of O((V+n_bigrams)*E)
            self.lm_mode = "sparse"
            rows = None
            bg = lm.bigram_rows_dense(cols_E) / SHIFT
            bg[:, self.isfill_E] = 0.0
            tgc_next, tg_cols, tg_vals, bo2w = \
                lm.trigram_corrections(cols_E)
            S_max = int(np.max(tgc_next[1:] - tgc_next[:-1])) \
                if n_bg else 0
            self._lm_sparse = dict(
                bg=bg, tgc_next=tgc_next.astype(np.int32),
                tg_cols=np.concatenate(
                    [tg_cols, np.zeros(S_max, np.int32)]),
                tg_vals=np.concatenate(
                    [tg_vals / SHIFT, np.zeros(S_max, np.float32)]),
                bo2w=bo2w / SHIFT, S_max=S_max, n_bg=n_bg)
            self.lm_order_used = 3 if len(tg_cols) else 2
            with_tri = n_bg > 0
        ctx_next = np.empty((V + 1, self.nE), dtype=np.float32)
        ctx_next[:, :] = (1 + cols_E)[None, :].astype(np.float32)
        ctx2h1 = np.full(R, V, np.int32)
        ctx2h1[1:1 + V] = np.arange(V)
        ctx2h2 = np.full(R, V, np.int32)
        if with_tri:
            ho, hn = lm.bigram_entries()
            ctx2h1[1 + V:] = hn
            ctx2h2[1 + V:] = ho
            # vectorized scatter of trigram-context successors
            # (ADVICE r2 low #4: no per-bigram Python loop)
            real_cols = np.nonzero(~self.isfill_E)[0]
            key = cols_E[real_cols]
            order = np.argsort(key, kind="stable")
            skey = key[order]
            beg = np.searchsorted(skey, hn)
            end = np.searchsorted(skey, hn, side="right")
            cnt = end - beg
            if cnt.sum():
                r_idx = np.repeat(ho, cnt)
                v_idx = np.repeat(1 + V + np.arange(len(ho)), cnt)
                base = np.repeat(beg, cnt)
                within = (np.arange(cnt.sum())
                          - np.repeat(np.cumsum(cnt) - cnt, cnt))
                c_idx = real_cols[order[base + within]]
                ctx_next[r_idx, c_idx] = v_idx.astype(np.float32)
        self._lm_rows, self._ctx_next = rows, ctx_next
        self._ctx2h1, self._ctx2h2 = ctx2h1, ctx2h2
        return rows, ctx_next, ctx2h1, ctx2h2

    FAT_CAP = 1024       # CSR rows longer than this densify ("fat" rows)

    def _lm_tables_csr(self, cols_E):
        """Mode C host tables: fully-sparse exact-trigram LM path.

        Per entry column e the base successor score under history h is
        uni_row[e] + bo1w[h]; explicit bigrams overlay via a CSR scatter
        (bg_next/bg_cols/bg_vals), successor LM contexts likewise
        (1 + cols_E base, bg_ctx overlay); histories whose expanded row
        exceeds FAT_CAP (sentence-start <s> reaches ~V successors) get
        precomputed dense rows instead.  Trigram corrections and
        per-context metadata are identical to mode B."""
        lm, V = self.lm, self.V
        n_bg = lm.counts[1]
        self.lm_mode = "csr"
        uni = (lm.lv_prob[0][:V].astype(np.float64) * lm.lw
               + lm.log_wip).astype(np.float32)
        bo1w = np.zeros(V + 1, np.float32)
        bo1w[:V] = lm.lv_bo[0][:V].astype(np.float64) * lm.lw
        uni_row = uni[cols_E] / SHIFT
        uni_row[self.isfill_E] = 0.0
        bo1w = bo1w / SHIFT
        bg_next, bg_cols, bg_vals, bg_ctx = lm.bigram_csr(
            cols_E, skip=self.isfill_E)
        bg_vals = bg_vals / SHIFT
        rlen = bg_next[1:] - bg_next[:-1]                 # [V+1]
        fat_hs = np.nonzero(rlen > self.FAT_CAP)[0]
        n_fat = len(fat_hs)
        fat_rows = np.zeros((max(n_fat, 1), self.nE), np.float32)
        fat_ctx = np.zeros((max(n_fat, 1), self.nE), np.float32)
        ctx_base = (1 + cols_E).astype(np.float32)
        for i, h in enumerate(fat_hs):
            row = (uni_row + bo1w[h]).astype(np.float32)
            crow = ctx_base.copy()
            lo, hi = int(bg_next[h]), int(bg_next[h + 1])
            row[bg_cols[lo:hi]] = bg_vals[lo:hi]
            crow[bg_cols[lo:hi]] = bg_ctx[lo:hi]
            fat_rows[i] = row
            fat_ctx[i] = crow
        fat_of = np.full(V + 1, -1, np.int32)
        fat_of[fat_hs] = np.arange(n_fat)
        # non-fat rows padded to SB for in-scan dynamic slices; fat rows
        # point start at 0/len 0
        kept = rlen[rlen <= self.FAT_CAP]
        SB = int(kept.max()) if len(kept) else 0
        keepmask = np.repeat(rlen <= self.FAT_CAP, rlen)
        bg_cols_k = bg_cols[keepmask]
        bg_vals_k = bg_vals[keepmask]
        bg_ctx_k = bg_ctx[keepmask]
        rlen_k = np.where(rlen <= self.FAT_CAP, rlen, 0)
        start_k = np.concatenate([[0], np.cumsum(rlen_k)[:-1]])
        umeta = np.zeros((V + 1, 4), np.int32)
        umeta[:, 0] = start_k
        umeta[:, 1] = rlen_k
        umeta[:, 2] = bo1w.astype(np.float32).view(np.int32)
        umeta[:, 3] = fat_of
        tgc_next, tg_cols, tg_vals, bo2w = lm.trigram_corrections(cols_E)
        S_max = int(np.max(tgc_next[1:] - tgc_next[:-1])) if n_bg else 0
        self._lm_sparse = dict(
            csr=True, uni_row=uni_row, umeta=umeta,
            bg_cols=np.concatenate([bg_cols_k,
                                    np.zeros(SB, np.int32)]),
            bg_vals=np.concatenate([bg_vals_k,
                                    np.zeros(SB, np.float32)]),
            bg_ctx=np.concatenate([bg_ctx_k, np.zeros(SB, np.float32)]),
            SB=SB, fat_rows=fat_rows, fat_ctx=fat_ctx, n_fat=n_fat,
            ctx_base=ctx_base,
            tgc_next=tgc_next.astype(np.int32),
            tg_cols=np.concatenate([tg_cols, np.zeros(S_max, np.int32)]),
            tg_vals=np.concatenate([tg_vals / SHIFT,
                                    np.zeros(S_max, np.float32)]),
            bo2w=bo2w / SHIFT, S_max=S_max, n_bg=n_bg)
        self.lm_order_used = 3 if len(tg_cols) else 2
        ho, hn = lm.bigram_entries()
        ctx2h1 = np.full(1 + V + n_bg, V, np.int32)
        ctx2h1[1:1 + V] = np.arange(V)
        ctx2h1[1 + V:] = hn
        ctx2h2 = np.full(1 + V + n_bg, V, np.int32)
        ctx2h2[1 + V:] = ho
        self._lm_rows, self._ctx_next = None, None
        self._ctx2h1, self._ctx2h2 = ctx2h1, ctx2h2
        return None, None, ctx2h1, ctx2h2

    # -- guard tables --------------------------------------------------------

    def _guard_tables(self, rows_np, ctx2h1, maxb_np, J):
        """Per-column top-J predecessor-bonus tables for the tightened
        top-K exactness guard (see _make_scan).  BMAX[h, e] bounds the
        successor score into column e of ANY context whose newest word
        is h; a real word's exit context always has h = that word
        (erw1 assignment in the scan), so excluded real exits are
        bounded by their own live exit score + BMAX[w].  Returns
        (gw [J, E] word-axis ids, gval [J, E], grest [E] floor for all
        other words + the empty-history class, fill_w word-axis filler
        ids) or None when the mode/size doesn't support it."""
        V, E, W = self.V, self.nE, self.W
        if self.lm_mode == "rows":
            R = rows_np.shape[0]
            BMAX = np.full((V + 1, E), -1e30, np.float32)
            np.maximum.at(BMAX, np.minimum(ctx2h1[:R], V), rows_np)
            empty_row = BMAX[V].copy()
        elif self.lm_mode == "sparse":
            sp = self._lm_sparse
            bg = sp["bg"]                               # [V+1, E]
            n_bg = sp["n_bg"]
            addv = np.zeros(V + 1, np.float32)
            if n_bg:
                ho, hn = self.lm.bigram_entries()
                np.maximum.at(addv, hn, sp["bo2w"].astype(np.float32))
            BMAX = bg + addv[:, None]
            if n_bg:
                tgcn = sp["tgc_next"].astype(np.int64)
                n_tg = int(tgcn[-1])
                if n_tg:
                    h1_rep = np.repeat(hn, tgcn[1:] - tgcn[:-1])
                    np.maximum.at(
                        BMAX, (h1_rep, sp["tg_cols"][:n_tg]),
                        sp["tg_vals"][:n_tg])
            empty_row = BMAX[V].copy()
        else:
            return None                                 # mode C: fallback
        self._guard_bmax = BMAX                         # [V+1, E] f32
        cand = BMAX[np.minimum(self.col_lm, V)]         # [W, E]
        cand[self.is_fill] = -np.inf
        cand[self.lm_wid < 0] = -np.inf
        Jc = min(J, max(int((~self.is_fill).sum()) - 1, 1))
        part = np.argpartition(-cand, Jc, axis=0)[:Jc + 1]   # [J+1, E]
        vals = np.take_along_axis(cand, part, axis=0)
        order = np.argsort(-vals, axis=0, kind="stable")
        part = np.take_along_axis(part, order, axis=0)
        vals = np.take_along_axis(vals, order, axis=0)
        gw = part[:Jc].astype(np.int32)
        gval = np.nan_to_num(vals[:Jc], neginf=-1e30).astype(np.float32)
        grest = np.maximum(
            np.nan_to_num(vals[Jc], neginf=-1e30), empty_row
        ).astype(np.float32)
        fillw = np.nonzero(self.is_fill)[0].astype(np.int32)
        return gw, gval, grest, fillw

    # -- the scan ------------------------------------------------------------

    def _make_scan(self, minimal=False, mask_carry=False):
        """Build the jitted per-utterance scan.

        minimal=False: full per-frame records ([T, W] exits + [T, E]
        entries) — required by the lattice layer / adapt_records.
        minimal=True: top-K-compressed records for hyp-only decoding —
        per frame only the top-(K+1) exits (score, word, entry frame,
        entry target; slot K pins the finish word) plus a [E] uint8
        winner-rank map.  Exact for the 1-best backtrace because every
        path predecessor is by construction a top-K exit of its frame
        (entries source only from the shortlist); ~30x less HBM and
        record-write traffic (a [T~4400, E] f32 record batch is ~23 GB
        at 20k words — the round-4 corpus bench OOM).

        mask_carry=True freezes the carry on invalid (padding) frames —
        required ONLY when the final carry is consumed across calls (the
        streaming with_carry path).  Batch/one-shot decodes leave it
        False: nothing after an utterance's last frame is ever read
        (records and the backtrace are causal), and the where(valid)
        tree select costs a full read+write pass over every carry
        array per step (~7% of the 20k scan, round-5 xprof)."""
        if self._scan_fn.get((minimal, mask_carry)) is not None:
            return self._scan_fn[(minimal, mask_carry)]
        import jax
        import jax.numpy as jnp
        from ..ops.hmm import hmm_step_sm

        NST = self.NST
        W, n_multi, SP, nE = self.W, self.n_multi, self.SP, self.nE
        n_rc = self.n_rcp
        ci0 = n_multi + self.n_single
        n_ciw = self.n_ci
        K = min(self.topk, W)
        n_ciph = self.mdef.n_ciphone
        rows_np, ctxn_np, ctx2h1_np, ctx2h2_np = self._lm_tables()
        mode_rows = self.lm_mode == "rows"
        mode_csr = self.lm_mode == "csr"
        # h1/h2 (and mode-B trigram metadata) ride along the row fetches
        # instead of separate per-K element gathers: inside the scan an
        # element gather costs ~latency per index (x B x K per step,
        # measured 175us/fusion at B=256), while appending columns to an
        # already-fetched row is free bandwidth.
        # The LM row table and ctx_next can reach GBs at 20k+ words:
        # they flow into the jitted scan as ARGUMENTS (self._dev_tables)
        # rather than captured constants.  Inside the scan body the
        # names rows_tab / bg_tab / ctx_next below refer to traced
        # values bound by scan_fn.
        dev_tables = {}
        if not mode_csr:
            dev_tables["ctx_next"] = ctxn_np
        if mode_rows:
            # rows + [h1, h2] as two appended f32 columns (exact < 2^24)
            dev_tables["rows"] = np.concatenate(
                [rows_np, ctx2h1_np[:, None].astype(np.float32),
                 ctx2h2_np[:, None].astype(np.float32)], axis=1)
        else:
            sp = self._lm_sparse
            S_TRI = sp["S_max"]
            N_BG = sp["n_bg"]
            # Trigram corrections as PADDED 2D row tables when memory
            # allows: the per-K fetch becomes a bandwidth-bound row
            # gather instead of an arbitrary-offset flat-array element
            # gather (measured 0.15 G elem/s latency-bound, ~0.6 ms/step
            # at the 20k config; round-5 xprof fusion.437/.438).
            tg2d_budget = int(os.environ.get("PS_TG2D_BYTES", 1 << 30))
            TG2D = bool(S_TRI and N_BG
                        and N_BG * S_TRI * 8 <= tg2d_budget)
            if TG2D:
                tgcn = sp["tgc_next"].astype(np.int64)
                n_tg = int(tgcn[-1])
                cnts = tgcn[1:] - tgcn[:-1]
                rows_i = np.repeat(np.arange(N_BG), cnts)
                within = np.arange(n_tg) - np.repeat(tgcn[:-1], cnts)
                tg2c = np.zeros((N_BG, S_TRI), np.int32)
                tg2v = np.zeros((N_BG, S_TRI), np.float32)
                tg2c[rows_i, within] = sp["tg_cols"][:n_tg]
                tg2v[rows_i, within] = sp["tg_vals"][:n_tg]
                dev_tables["tg2c"] = tg2c
                dev_tables["tg2v"] = tg2v
            else:
                dev_tables["tg_cols"] = sp["tg_cols"]
                dev_tables["tg_vals"] = sp["tg_vals"]
            if mode_csr:
                dev_tables["uni_row"] = sp["uni_row"]      # [E] f32
                dev_tables["umeta"] = sp["umeta"]          # [V+1, 4] i32
                dev_tables["fat_rows"] = sp["fat_rows"]    # [n_fat, E]
                dev_tables["fat_ctx"] = sp["fat_ctx"]
                dev_tables["ctx_base"] = sp["ctx_base"]    # [E] f32
                dev_tables["bg_cols"] = sp["bg_cols"]
                dev_tables["bg_vals"] = sp["bg_vals"]
                dev_tables["bg_ctx"] = sp["bg_ctx"]
                SB_CSR = sp["SB"]
                N_FAT = sp["n_fat"]
            else:
                dev_tables["bg"] = sp["bg"]                # [V+1, E] f32
            # per-bigram-context metadata rows [n_bg, 8] i32:
            # (h1, h2, bo2w bits, tgc_start, tgc_count, pad...)
            nbg1 = max(N_BG, 1)
            bgmeta = np.zeros((nbg1, 8), np.int32)
            if N_BG:
                tgcn = sp["tgc_next"].astype(np.int64)
                bgmeta[:, 0] = ctx2h1_np[1 + self.V:]
                bgmeta[:, 1] = ctx2h2_np[1 + self.V:]
                bgmeta[:, 2] = sp["bo2w"].astype(np.float32).view(np.int32)
                bgmeta[:, 3] = tgcn[:-1]
                bgmeta[:, 4] = (tgcn[1:] - tgcn[:-1])
            dev_tables["bgmeta"] = bgmeta
        # Top-K guard bound (round-3 review next #5): maxb_np[e] = max
        # over ALL LM contexts of column e's weighted successor score.
        # An exit excluded by the top-K shortlist scores <= kv[K-1], so
        # its best possible entry into column e is bounded by
        # kv[K-1] + maxb + wpen (fillers: kv[K-1] + fillpen).  Each
        # frame the scan counts columns where that bound beats BOTH the
        # kept entry and the incumbent first-state score — a nonzero
        # count means top-K exactness is unproven for the utterance
        # (the reference's wbeam, ngram_search_fwdtree.c:1130, is the
        # analogous *undeclared* approximation).  Unoccupied
        # class-exclusive single-phone columns are guarded only once
        # occupied (documented limitation).
        if mode_rows:
            maxb_np = rows_np[:, :self.nE].max(axis=0)
        else:
            sp_ = self._lm_sparse
            if mode_csr:
                um = sp_["umeta"]
                bo1w_all = um[:, 2].view(np.float32).astype(np.float64)
                maxb_np = sp_["uni_row"].astype(np.float64) \
                    + float(bo1w_all.max())
                nbgx = len(sp_["bg_cols"]) - sp_["SB"]
                if nbgx:
                    bgmx = np.full(self.nE, -np.inf)
                    np.maximum.at(bgmx, sp_["bg_cols"][:nbgx],
                                  sp_["bg_vals"][:nbgx].astype(np.float64))
                    maxb_np = np.maximum(maxb_np, bgmx)
                if sp_["n_fat"]:
                    maxb_np = np.maximum(
                        maxb_np, sp_["fat_rows"].max(axis=0))
            else:
                maxb_np = sp_["bg"].max(axis=0).astype(np.float64)
            if sp_["n_bg"]:
                maxb_np = maxb_np + max(float(sp_["bo2w"].max()), 0.0)
                n_tg = int(sp_["tgc_next"][-1])
                if n_tg:
                    tgmax = np.full(self.nE, -np.inf)
                    np.maximum.at(tgmax, sp_["tg_cols"][:n_tg],
                                  sp_["tg_vals"][:n_tg].astype(np.float64))
                    maxb_np = np.maximum(maxb_np, tgmax)
        # -- tightened per-predecessor guard (round-4 judge next #3) --
        # A REAL word w's exit always carries an LM context whose newest
        # word is w itself (erw1 below), so an excluded exit of w can
        # add at most BMAX[lm(w), e] into column e — not the global
        # per-column max.  The guard uses the EXACT live exit scores of
        # the J best-bonus predecessor words per column (excluding
        # current top-K members, whose candidates were evaluated
        # exactly), a kv[K-1] + (J+1)-th-bonus floor for the rest, and
        # exact filler-exit scores with the global bound (fillers
        # inherit contexts).  Sound, and orders of magnitude tighter
        # than the round-4 per-column max (guard_unproven).
        guard_budget = int(os.environ.get("PS_GUARD_BYTES", 3 << 30))
        GJ = int(os.environ.get("PS_GUARD_TOPJ", "8"))
        GM = 0
        guard_np = None
        if K < W and GJ > 0 and self.W * self.nE * 4 <= guard_budget:
            guard_np = self._guard_tables(
                rows_np, ctx2h1_np, maxb_np, GJ)
        if guard_np is not None:
            gw_t, gv_t, grest_t, fillw_t = guard_np
            dev_tables["guard_w"] = gw_t              # [J, E] i32
            dev_tables["guard_v"] = gv_t              # [J, E] f32
            dev_tables["guard_rest"] = grest_t        # [E] f32
            dev_tables["guard_fillw"] = fillw_t       # [n_fill] i32
            # flattened [n_rc, W] indices of each contributor's exit AT
            # THE COLUMN'S right-context plane: an excluded exit of w
            # enters column e with sv[f0(e), w] <= escore[w] — strictly
            # tighter than the word's best-over-rc exit score
            dev_tables["guard_wf"] = (
                self.f0p_E[None, :].astype(np.int64) * W
                + gw_t.astype(np.int64)).astype(np.int32)
            dev_tables["f0p_E"] = self.f0p_E.astype(np.int32)
            # dynamic-rank refinement (OPT-IN, PS_GUARD_TOPM=64): with
            # the full per-newest-word bonus table on device, exits at
            # ranks K..K+M get their EXACT per-word bonus and the
            # rest-floor drops to kv[K+M-1].  Off by default: the
            # +1.6 GB BMAX table and per-step [M, E] gathers pushed the
            # B=8 long-utterance corpus decode into TPU-worker crashes
            # for a ~1.35x unproven-count reduction (PERF_NOTES).
            GM = int(os.environ.get("PS_GUARD_TOPM", "0"))
            bmax_budget = int(os.environ.get("PS_GUARD_BMAX_BYTES",
                                             2 << 30))
            bmax_tab = getattr(self, "_guard_bmax", None)
            if GM > 0 and bmax_tab is not None \
                    and bmax_tab.nbytes <= bmax_budget and K + GM < W:
                dev_tables["guard_bmax"] = bmax_tab.astype(np.float32)
                dev_tables["col_lm_W"] = np.minimum(
                    self.col_lm, self.V).astype(np.int32)
                dev_tables["isfill_W"] = self.is_fill
            else:
                GM = 0
            self._guard_bmax = None          # free the host copy
            if len(fillw_t):
                dev_tables["guard_fillwf"] = (
                    self.f0p_E[None, :].astype(np.int64) * W
                    + fillw_t[:, None].astype(np.int64)).astype(np.int32)
        # Every W/E-proportional structural array below goes through
        # dev_tables as a jit ARGUMENT, not a captured constant: at
        # 135k words the tp/one-hot/senone-id constants alone exceed
        # the remote compile service's program size limit (HTTP 413),
        # and constants also bloat lowering time (observed 3.28 GB
        # captures -> tens of minutes).
        dev_tables["maxb_E"] = maxb_np.astype(np.float32)
        dev_tables["accept_E"] = self.accept_E           # [E, n_ciph]
        dev_tables["isfill_E"] = self.isfill_E
        dev_tables["fillpen_E"] = self.fillpen_E
        dev_tables["lmwid_E"] = self.lmwid_E.astype(np.float32)
        dev_tables["isreal_E"] = ~self.isfill_E
        dev_tables["f0_onehot"] = (
            self.f0p_E[:, None] == np.arange(n_rc)[None, :]
        ).astype(np.float32)                             # [E, n_rc]
        dev_tables["lc_cls_T"] = self.lc_cls.T.astype(np.int32).copy()
        dev_tables["etgt0"] = self.etgt0.astype(np.int32)
        dev_tables["fb_ci"] = self.fb_ci.astype(np.float32)
        wpen = np.float32(self.nwpen + self.pip)
        pip = np.float32(self.pip)

        # flat senone-id list for the per-chunk pre-gather
        seg_ids = []
        seg_shapes = []

        def add_seg(arr):
            seg_shapes.append(arr.shape)
            seg_ids.append(arr.reshape(-1))
            return len(seg_shapes) - 1

        si_ch = [add_seg(ch.senid) for ch in self.chains]
        si_fv = [add_seg(ch.senid_first_d) for ch in self.chains]
        si_fin = add_seg(self.senid_fin_d) if n_multi else None
        si_sp = add_seg(self.senid_sp[:, :, :SP]) if SP else None
        si_ci = [add_seg(ch.senid) for ch in self.ci_chains]
        senid_all = np.concatenate(seg_ids) if seg_ids else np.zeros(0, int)
        seg_off = np.concatenate([[0], np.cumsum(
            [np.prod(s) for s in seg_shapes])]).astype(np.int64)
        dev_tables["senid_all"] = senid_all.astype(np.int32)

        def seg_of(g, i):
            lo, hi = int(seg_off[i]), int(seg_off[i + 1])
            return g[lo:hi].reshape(seg_shapes[i])

        for bi, ch in enumerate(self.chains):
            dev_tables[f"fd_oh{bi}"] = ch.fd_onehot
            dev_tables[f"ch_tp{bi}"] = ch.tp
            dev_tables[f"ch_fm{bi}"] = ch.firstmask
            dev_tables[f"ch_nv{bi}"] = ch.n_var.astype(np.int32)
        for bi, ch in enumerate(self.ci_chains):
            dev_tables[f"ci_tp{bi}"] = ch.tp
            dev_tables[f"ci_fm{bi}"] = ch.firstmask
        # Pallas fan kernel (ops/pallas_fan.py): fuses the finals-fan
        # expansion einsum + 3-state update + metadata selects + entry
        # merge + exit reduction into one VMEM-resident pass per tile —
        # the largest per-step block at big vocabularies (round-5
        # xprof).  Exact (split-bf16 expansion reconstructs f32; tie
        # semantics asserted vs hmm_step_sm in tests/test_pallas_fan).
        # Default on for 3-state models at >= 4000 words off-CPU;
        # PS_PALLAS_FAN=1/0 forces (CPU runs use interpret mode).
        dev = jax.config.jax_default_device
        plat = getattr(dev, "platform", None) or jax.default_backend()
        fan_env = os.environ.get("PS_PALLAS_FAN")
        use_fan = (NST == 3 and n_multi > 0) and (
            fan_env == "1"
            or (fan_env != "0" and n_multi >= 4000 and plat != "cpu"))
        fan_interp = plat == "cpu"
        # fan carry planes live pre-padded to the pallas tile width so
        # the kernel round-trips them without a per-step pad+slice
        FAN_TILE = min(1024, max(128, 1 << max(n_multi - 1, 1)
                                 .bit_length()))
        Wfan = -(-max(n_multi, 1) // FAN_TILE) * FAN_TILE
        if n_multi and use_fan:
            dev_tables["lp_idx"] = self.lp_idx
            dev_tables["tp_fin12"] = np.ascontiguousarray(
                self.tp_fin[:n_multi].transpose(1, 2, 0).reshape(
                    12, n_multi))
        elif n_multi:
            dev_tables["lp_oh"] = self.lp_onehot
            dev_tables["tp_fin"] = self.tp_fin[:n_multi]
        if SP:
            dev_tables["tp_sp"] = self.tp_sp[:SP]
        # Every one-hot matmul in the step runs through oh_matmul
        # below: a 3-pass bf16 split that reconstructs the f32 result
        # bit-exactly at half the MXU passes of Precision.HIGHEST
        # (which the round-4 code used), making the round-4 opt-in
        # PS_EXPAND_PRECISION fast mode obsolete — the exact path now
        # matches its speed.
        # The Pallas fused chain kernel (ops/pallas_chain.py) was
        # measured and RETIRED from this path: even with the round-4
        # batch-folded block layout it loses to XLA's fusions on turtle
        # B=512 (4.34 vs 3.79 ms/step; docs/PERF_NOTES.md).  The kernel
        # and its exactness tests remain as a validated study.
        # CHUNK=32 measured -5%/step at 20k but the [CH, B, N_flat]
        # pre-gather buffer (tile-padded ~4x) plus the guard tables
        # crashed the TPU worker on long-utterance B=8 corpus batches
        # (HBM exhaustion); 16 is the safe default, PS_NGRAM_CHUNK
        # opts into 32 when memory allows
        try:
            CH = int(os.environ.get("PS_NGRAM_CHUNK", self.CHUNK))
        except ValueError:
            CH = self.CHUNK

        def tens3(shape, val=BIG_NEG, dtype=np.float32):
            return tuple(jnp.full(shape, val, dtype) for _ in range(NST))

        def init_carry():
            c = {}
            c["ch"] = [dict(S=tens3((ch.D, ch.Wb)),
                            TF=tens3((ch.D, ch.Wb), 0, np.int32),
                            CTX=tens3((ch.D, ch.Wb), 0, np.int32),
                            VAR=tens3((ch.Wb,), 0, np.int32))
                       for ch in self.chains]
            if not n_multi:
                c["fin"] = None
            elif use_fan:
                # stacked, tile-padded [3, n_rc, Wfan] planes for the
                # pallas fan kernel (pad columns never win: NEG_INF
                # scores, NEG_INF entry pads)
                c["fin"] = dict(
                    S=jnp.full((NST, n_rc, Wfan), BIG_NEG, np.float32),
                    TF=jnp.zeros((NST, n_rc, Wfan), np.int32),
                    CTX=jnp.zeros((NST, n_rc, Wfan), np.int32))
            else:
                c["fin"] = dict(S=tens3((n_rc, n_multi)),
                                TF=tens3((n_rc, n_multi), 0, np.int32),
                                CTX=tens3((n_rc, n_multi), 0, np.int32))
            c["sp"] = dict(S=tens3((n_rc, SP)),
                           TF=tens3((n_rc, SP), 0, np.int32),
                           CTX=tens3((n_rc, SP), 0, np.int32)) if SP else None
            ci_list = []
            for ch in self.ci_chains:
                e = dict(S=tens3((ch.D, ch.Wb)),
                         TF=tens3((ch.D, ch.Wb), 0, np.int32),
                         CTX=tens3((ch.D, ch.Wb), 0, np.int32))
                ci_list.append(e)
            c["ci"] = ci_list
            if self.start_idx is not None:
                s_lm = self.lm.wid("<s>")
                # locate <s> in its CI bucket
                for bi, ch in enumerate(self.ci_chains):
                    if ch.w_lo <= self.start_idx < ch.w_hi:
                        k = self.start_idx - ch.w_lo
                        dep = int(ch.fd[k])
                        S0 = np.full((ch.D, ch.Wb), NEG_INF, np.float32)
                        S0[dep, k] = 0.0
                        C0 = np.zeros((ch.D, ch.Wb), np.int32)
                        if s_lm >= 0:
                            C0[dep, k] = 1 + s_lm
                        e = c["ci"][bi]
                        e["S"] = (jnp.asarray(S0),) + e["S"][1:]
                        e["CTX"] = (jnp.asarray(C0),) + e["CTX"][1:]
            return c

        self.init_carry = init_carry()

        # small configs are kernel-count-bound (docs/PERF_NOTES.md):
        # one bf16x6 dot beats three barriered bf16 dots there; large
        # configs are FLOP-bound and the 3-pass split wins
        _oh_mode = os.environ.get(
            "PS_OH_MATMUL", "bf16x3" if W >= 4000 else "hi")

        def oh_matmul(sub, vals, onehot):
            """Exact one-hot matmul in 3 bf16 passes: vals = a1+a2+a3
            with each part bf16-exact and the 0/1 operand exact in
            bf16, so the accumulated products reconstruct the f32
            result bit-exactly — at half the MXU passes of
            Precision.HIGHEST (bf16x6).  Used for every score/payload
            einsum whose other operand is 0/1 (ops/pallas_fan.py uses
            the same identity in-kernel; proof in its docstring)."""
            if _oh_mode == "hi":        # A/B fallback: bf16x6
                return jnp.einsum(sub, vals, onehot,
                                  precision=jax.lax.Precision.HIGHEST)
            # EVERY bf16 cast and partial product is wrapped in an
            # optimization_barrier: the TPU toolchain compiles with
            # --xla_allow_excess_precision=true, under which XLA
            # deletes f32->bf16->f32 convert pairs (collapsing the
            # three splits into one plain-bf16 dot) and refolds
            # dot(a1,oh)+dot(a2,oh)+dot(a3,oh) into dot(a1+a2+a3,oh).
            # Either rewrite silently destroys the exactness this
            # split exists for (observed: corrupted integer payloads,
            # 68% WER).  Verified bit-exact on-chip with the barriers;
            # tests/test_pallas_fan.py pins the identity.
            bar = jax.lax.optimization_barrier
            oh = onehot.astype(jnp.bfloat16)
            a1 = bar(vals.astype(jnp.bfloat16))
            r1 = vals - a1.astype(jnp.float32)
            a2 = bar(r1.astype(jnp.bfloat16))
            a3 = bar((r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16))
            out = None
            for a in (a1, a2, a3):
                p = bar(jnp.einsum(sub, a, oh,
                                   preferred_element_type=jnp.float32))
                out = p if out is None else out + p
            return out

        def first_select(vals, var, n):
            """One-hot select of per-variant planes: vals [RF, Wb],
            var [Wb] int -> [Wb] (clamped to the word's variant count)."""
            v = jnp.minimum(var, n - 1)[None, :]
            oh = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) == v
            return jnp.sum(jnp.where(oh, vals, 0.0), axis=0)

        def argmax_payload(cand, axis0_payloads):
            """cand [A, ...]: max over axis 0 with first-winner payload
            select.  axis0_payloads: list of [A, ...]-broadcastable
            arrays.  Returns (max [...], [payload [...], ...]).
            jnp.argmax returns the FIRST maximal index, giving the same
            tie order as the old cumsum-of-equals formulation with one
            reduce instead of a compare+cumsum+mask chain."""
            mx = jnp.max(cand, axis=0)
            am = jnp.argmax(cand, axis=0)
            m = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0) \
                == am[None]
            outs = []
            for p in axis0_payloads:
                pb = jnp.broadcast_to(p, cand.shape)
                outs.append(jnp.sum(jnp.where(m, pb, jnp.zeros_like(pb)),
                                    axis=0))
            return mx, outs

        def make_step(tables):
            rows_tab = tables.get("rows")
            bg_tab = tables.get("bg")
            bgmeta_tab = tables.get("bgmeta")
            tg2c_j = tables.get("tg2c")
            tg2v_j = tables.get("tg2v")
            ctx_next = tables.get("ctx_next")
            uni_tab = tables.get("uni_row")
            umeta_tab = tables.get("umeta")
            fat_tab = tables.get("fat_rows")
            fatctx_tab = tables.get("fat_ctx")
            ctxbase_tab = tables.get("ctx_base")
            tgc_j = tables.get("tg_cols")
            tgv_j = tables.get("tg_vals")
            bgc_j = tables.get("bg_cols")
            bgv_j = tables.get("bg_vals")
            bgx_j = tables.get("bg_ctx")
            maxb_E = tables["maxb_E"]
            accept_E = tables["accept_E"]
            isfill_E = tables["isfill_E"]
            fillpen_E = tables["fillpen_E"]
            lmwid_E = tables["lmwid_E"]
            isreal_E = tables["isreal_E"]
            f0_onehot = tables["f0_onehot"]
            fd_oh = [tables[f"fd_oh{b}"] for b in range(len(self.chains))]
            ch_tp = [tables[f"ch_tp{b}"] for b in range(len(self.chains))]
            ch_fm = [tables[f"ch_fm{b}"] for b in range(len(self.chains))]
            ch_nv = [tables[f"ch_nv{b}"] for b in range(len(self.chains))]
            ci_tp = [tables[f"ci_tp{b}"]
                     for b in range(len(self.ci_chains))]
            ci_fm = [tables[f"ci_fm{b}"]
                     for b in range(len(self.ci_chains))]
            lp_oh = tables.get("lp_oh")
            tp_fin = tables.get("tp_fin")
            tp_sp = tables.get("tp_sp")

            def step(carry, xs):
                g, t, valid = xs            # g: [N_flat] gathered senone costs
                newc = {"ch": [], "ci": []}
                outs_last = []              # chain last-depth outs (multi)
                ch_exits = []               # per-bucket saved arrays
                # ---------- chain buckets (multi first+interior) ----------
                for bi, ch in enumerate(self.chains):
                    e = carry["ch"][bi]
                    pre = seg_of(g, si_ch[bi])           # [3, D, Wb] costs
                    prev_d = seg_of(g, si_fv[bi])        # [3, RF, n_fd]
                    # expand per-diphone variant planes to words (exact
                    # one-hot f32 matmul; see senid_first_d in _build)
                    prev = oh_matmul("jvf,fw->jvw", prev_d, fd_oh[bi])
                    fm = ch_fm[bi]                       # [D, Wb]
                    nv = ch_nv[bi]
                    sen = []
                    for j in range(NST):
                        sf = first_select(-prev[j], e["VAR"][j], nv)
                        s = -pre[j]
                        s = jnp.where(fm, sf[None, :], s)
                        sen.append(s)
                    metas = (e["TF"], e["CTX"],
                             tuple(jnp.broadcast_to(v[None, :], (ch.D, ch.Wb))
                                   for v in e["VAR"]))
                    newS, (nTF, nCTX, nVARd), out, _, (oTF, oCTX, _) = \
                        hmm_step_sm(e["S"], tuple(sen), ch_tp[bi], metas=metas)
                    # intra-word shift: node d's state0 entry from node d-1
                    sh = jnp.concatenate(
                        [jnp.full((1, ch.Wb), NEG_INF), out[:-1]]) + pip
                    sh = jnp.where(fm, NEG_INF, sh)   # first node: word entry only
                    shTF = jnp.concatenate([oTF[:1], oTF[:-1]])
                    shCTX = jnp.concatenate([oCTX[:1], oCTX[:-1]])
                    win = sh > newS[0]
                    s0 = jnp.where(win, sh, newS[0])
                    tf0 = jnp.where(win, shTF, nTF[0])
                    cx0 = jnp.where(win, shCTX, nCTX[0])
                    newc["ch"].append(dict(
                        S=(s0,) + newS[1:], TF=(tf0,) + nTF[1:],
                        CTX=(cx0,) + nCTX[1:],
                        VAR=tuple(jnp.sum(jnp.where(fm, v, 0), axis=0)
                                  for v in nVARd)))
                    outs_last.append(out[-1])
                    ch_exits.append((out[-1], oTF[-1], oCTX[-1]))
                # ---------- finals fan ----------
                if n_multi and use_fan:
                    from ..ops.pallas_fan import fan_step
                    e = carry["fin"]
                    pre_d = seg_of(g, si_fin)            # [3, n_rc, n_lp]
                    pred = jnp.concatenate(outs_last) + pip        # [Wm]
                    predTF = jnp.concatenate([x[1] for x in ch_exits])
                    predCTX = jnp.concatenate([x[2] for x in ch_exits])
                    nSf, nTFf, nCXf, sv_m, esc_m, etf_m, ecx_m = \
                        fan_step(e["S"], e["TF"], e["CTX"], pred,
                                 predTF, predCTX, pre_d,
                                 tables["lp_idx"], tables["tp_fin12"],
                                 n_real=n_multi, interpret=fan_interp)
                    fin_new = dict(S=nSf, TF=nTFf, CTX=nCXf)
                elif n_multi:
                    e = carry["fin"]
                    pre_d = seg_of(g, si_fin)            # [3, n_rc, n_lp]
                    pre = oh_matmul("jrn,nw->jrw", pre_d, lp_oh)
                    sen = tuple(-pre[j] for j in range(NST))
                    newS, (nTF, nCTX), out_f, _, (oTF_f, oCTX_f) = hmm_step_sm(
                        e["S"], sen, tp_fin, metas=(e["TF"], e["CTX"]))
                    # entry from chain last depth
                    pred = jnp.concatenate(outs_last) + pip        # [Wm]
                    predTF = jnp.concatenate([x[1] for x in ch_exits])
                    predCTX = jnp.concatenate([x[2] for x in ch_exits])
                    win = pred[None, :] > newS[0]
                    finS0 = jnp.where(win, pred[None, :], newS[0])
                    finTF0 = jnp.where(win, predTF[None, :], nTF[0])
                    finCTX0 = jnp.where(win, predCTX[None, :], nCTX[0])
                    fin_new = dict(S=(finS0,) + newS[1:],
                                   TF=(finTF0,) + nTF[1:],
                                   CTX=(finCTX0,) + nCTX[1:])
                    sv_m = out_f                                    # [n_rc, Wm]
                    esc_m, (etf_m, ecx_m) = argmax_payload(
                        out_f, [oTF_f, oCTX_f])
                else:
                    fin_new, sv_m = None, jnp.zeros((n_rc, 0))
                    esc_m = jnp.zeros((0,))
                    etf_m = ecx_m = jnp.zeros((0,), jnp.int32)
                # ---------- single-phone columns ----------
                if SP:
                    e = carry["sp"]
                    pre = seg_of(g, si_sp)
                    sen = tuple(-pre[j] for j in range(NST))
                    newS, (nTF, nCTX), out_s, _, (oTF_s, oCTX_s) = hmm_step_sm(
                        e["S"], sen, tp_sp, metas=(e["TF"], e["CTX"]))
                    sp_new = dict(S=newS, TF=nTF, CTX=nCTX)
                    colb, (coltf, colcx) = argmax_payload(
                        out_s, [oTF_s, oCTX_s])                     # [SP]
                    # rectangular [n_single, Cmax] layout: one vectorized
                    # per-word reduction (dead pad columns sit at NEG_INF)
                    nS, Cm = self.n_single, self.sp_cmax
                    colidx = jnp.arange(SP, dtype=jnp.int32) + n_multi
                    esc_s, (etf_s, ecx_s, etg_s) = argmax_payload(
                        colb.reshape(nS, Cm).T,
                        [coltf.reshape(nS, Cm).T,
                         colcx.reshape(nS, Cm).T,
                         colidx.reshape(nS, Cm).T])
                    sv_s = jnp.max(out_s.reshape(n_rc, nS, Cm),
                                   axis=2)                       # [n_rc, W_sp]
                else:
                    sp_new = None
                    sv_s = jnp.zeros((n_rc, 0))
                    esc_s = jnp.zeros((0,))
                    etf_s = ecx_s = jnp.zeros((0,), jnp.int32)
                    etg_s = jnp.zeros((0,), jnp.int32)
                # ---------- CI chains ----------
                esc_c, etf_c, ecx_c = [], [], []
                for bi, ch in enumerate(self.ci_chains):
                    e = carry["ci"][bi]
                    pre = seg_of(g, si_ci[bi])
                    fm = ci_fm[bi]
                    sen = tuple(-pre[j] for j in range(NST))
                    newS, (nTF, nCTX), out, _, (oTF, oCTX) = hmm_step_sm(
                        e["S"], sen, ci_tp[bi], metas=(e["TF"], e["CTX"]))
                    sh = jnp.concatenate(
                        [jnp.full((1, ch.Wb), NEG_INF), out[:-1]]) + pip
                    sh = jnp.where(fm, NEG_INF, sh)
                    shTF = jnp.concatenate([oTF[:1], oTF[:-1]])
                    shCTX = jnp.concatenate([oCTX[:1], oCTX[:-1]])
                    win = sh > newS[0]
                    newc["ci"].append(dict(
                        S=(jnp.where(win, sh, newS[0]),) + newS[1:],
                        TF=(jnp.where(win, shTF, nTF[0]),) + nTF[1:],
                        CTX=(jnp.where(win, shCTX, nCTX[0]),) + nCTX[1:]))
                    esc_c.append(out[-1])
                    etf_c.append(oTF[-1])
                    ecx_c.append(oCTX[-1])
                esc_c = (jnp.concatenate(esc_c) if esc_c
                         else jnp.zeros((0,)))
                etf_c = (jnp.concatenate(etf_c) if etf_c
                         else jnp.zeros((0,), jnp.int32))
                ecx_c = (jnp.concatenate(ecx_c) if ecx_c
                         else jnp.zeros((0,), jnp.int32))

                # ---------- word transitions ----------
                escore = jnp.concatenate([esc_m, esc_s, esc_c])      # [W]
                etf_w = jnp.concatenate([etf_m, etf_s, etf_c])
                ecx_w = jnp.concatenate([ecx_m, ecx_s, ecx_c])
                etgt_w = tables["etgt0"]
                if SP:
                    etgt_w = jnp.concatenate([
                        etgt_w[:n_multi], etg_s, etgt_w[n_multi + self.n_single:]])
                sv = jnp.concatenate([sv_m, sv_s,
                                      jnp.tile(esc_c[None], (n_rc, 1))], axis=1)
                # K+GM ranks: the word-transition block consumes the
                # first K; ranks K..K+GM refine the exactness guard
                kv2, ki2 = jax.lax.top_k(escore, K + GM)
                kv, ki = kv2[:K], ki2[:K]
                onek = (ki[:, None] == jnp.arange(W)[None, :]).astype(jnp.float32)
                # per-K payloads via exact one-hot matmul (ints < 2^24)
                pay = jnp.stack([ecx_w.astype(jnp.float32),
                                 tables["fb_ci"]],
                                axis=1)                              # [W, 2]
                payk = oh_matmul("wp,kw->kp", pay, onek)
                ctx_k = payk[:, 0].astype(jnp.int32)
                fb_k = payk[:, 1].astype(jnp.int32)
                svk = oh_matmul("rw,kw->kr", sv, onek)           # [K, n_rc]
                exg = oh_matmul("kr,er->ke", svk, f0_onehot)     # [K, E]
                # Row fetches are batched jnp.take gathers: one gather
                # kernel per table per step.  The round-3 idiom
                # vmap(dynamic_slice) lowers per (batch, K) instance for
                # small/offset slices — 576 one-microsecond kernels per
                # step per table at B=6/K=96, ~25% of the whole 20k scan
                # (round-5 xprof; big row gathers hit 14 G elem/s).
                if mode_rows:
                    lmfull = jnp.take(rows_tab, ctx_k, axis=0)   # [K, E+2]
                    lmrow = lmfull[:, :nE]
                    rw1_k = lmfull[:, nE].astype(jnp.int32)
                    rw2_k = lmfull[:, nE + 1].astype(jnp.int32)
                else:
                    # mode B: bigram row of the context's newest word (+
                    # trigram backoff), then sparse per-context overrides.
                    # All per-context metadata comes from ONE [K, 8] row
                    # fetch; unigram-context h1/h2 are arithmetic.
                    is_tri = ctx_k > self.V
                    b = jnp.clip(ctx_k - 1 - self.V, 0, max(N_BG - 1, 0))
                    meta = jnp.take(bgmeta_tab, b, axis=0)           # [K, 8]
                    rw1_k = jnp.where(
                        is_tri, meta[:, 0],
                        jnp.where(ctx_k > 0, ctx_k - 1, self.V))
                    rw2_k = jnp.where(is_tri, meta[:, 1], self.V)
                    bo2w_v = jax.lax.bitcast_convert_type(
                        meta[:, 2], jnp.float32)
                    h1c = jnp.minimum(rw1_k, self.V)
                    if mode_csr:
                        # mode C: base = unigram row + history backoff,
                        # explicit bigrams and successor contexts overlay
                        # via the per-history CSR slices; giant-fanout
                        # histories (<s>) use precomputed dense rows.
                        um = jnp.take(umeta_tab, h1c, axis=0)        # [K, 4]
                        bo1w_k = jax.lax.bitcast_convert_type(
                            um[:, 2], jnp.float32)
                        base = uni_tab[None, :] + bo1w_k[:, None]
                        ctxrow = jnp.broadcast_to(ctxbase_tab[None, :],
                                                  (K, nE))
                        if SB_CSR:
                            bstart, bcnt, bfat = (um[:, 0], um[:, 1],
                                                  um[:, 3])
                            posB0 = bstart[:, None] + jnp.arange(
                                SB_CSR, dtype=jnp.int32)[None, :]
                            wcB = jnp.take(bgc_j, posB0)
                            wvB = jnp.take(bgv_j, posB0)
                            wxB = jnp.take(bgx_j, posB0)
                            posB = jax.lax.broadcasted_iota(
                                jnp.int32, (K, SB_CSR), 1)
                            okB = posB < bcnt[:, None]
                            idxB = jnp.where(okB, wcB, nE)
                            rsel = jnp.arange(K)[:, None]
                            base = jnp.concatenate(
                                [base, jnp.zeros((K, 1), jnp.float32)],
                                axis=1).at[rsel, idxB].set(
                                jnp.where(okB, wvB, 0.0),
                                mode="drop")[:, :nE]
                            ctxrow = jnp.concatenate(
                                [ctxrow, jnp.zeros((K, 1), jnp.float32)],
                                axis=1).at[rsel, idxB].set(
                                jnp.where(okB, wxB, 0.0),
                                mode="drop")[:, :nE]
                        if N_FAT:
                            isfat = um[:, 3] >= 0
                            fidx = jnp.clip(um[:, 3], 0, N_FAT - 1)
                            fr = jnp.take(fat_tab, fidx, axis=0)
                            fx = jnp.take(fatctx_tab, fidx, axis=0)
                            base = jnp.where(isfat[:, None], fr, base)
                            ctxrow = jnp.where(isfat[:, None], fx,
                                               ctxrow)
                    else:
                        base = jnp.take(bg_tab, h1c, axis=0)     # [K, E]
                    lmrow = base + jnp.where(is_tri, bo2w_v,
                                             0.0)[:, None]
                    if S_TRI:
                        cnt = meta[:, 4]
                        if tg2c_j is not None:
                            wc = jnp.take(tg2c_j, b, axis=0)         # [K, S]
                            wv = jnp.take(tg2v_j, b, axis=0)
                        else:
                            start = meta[:, 3]
                            pos0 = start[:, None] + jnp.arange(
                                S_TRI, dtype=jnp.int32)[None, :]
                            wc = jnp.take(tgc_j, pos0)               # [K, S]
                            wv = jnp.take(tgv_j, pos0)
                        pos = jax.lax.broadcasted_iota(
                            jnp.int32, (K, S_TRI), 1)
                        ok = (pos < cnt[:, None]) & is_tri[:, None]
                        idx = jnp.where(ok, wc, nE)
                        lmp = jnp.concatenate(
                            [lmrow, jnp.zeros((K, 1), jnp.float32)], axis=1)
                        lmrow = lmp.at[
                            jnp.arange(K)[:, None], idx].set(
                            jnp.where(ok, wv, 0.0), mode="drop")[:, :nE]
                if not mode_csr:
                    ctxrow = jnp.take(ctx_next, jnp.maximum(rw1_k, 0),
                                      axis=0)                    # [K, E]
                fb_oh = (fb_k[:, None] ==
                         jnp.arange(n_ciph)[None, :]).astype(jnp.float32)
                # both operands are 0/1 (bf16-exact): DEFAULT precision
                # is already exact, no multi-pass emulation needed
                accm = jnp.einsum("kc,ec->ke", fb_oh, accept_E)
                cand = exg + jnp.where(isfill_E[None, :],
                                       fillpen_E[None, :],
                                       lmrow + wpen) \
                    + (accm - 1.0) * jnp.float32(1e30) \
                    + jnp.where(kv[:, None] > NEG_INF / 2, 0.0,
                                jnp.float32(NEG_INF))
                # First-winner payload select via ONE argmax + a [K, E]
                # one-hot: the generic argmax_payload would re-read the
                # 47 MB (at 20k words) `cand` array once per payload;
                # here the five per-K payloads ride a single [E, K] x
                # [K, 5] exact one-hot f32 matmul and only `ctxrow`
                # needs a masked-sum pass (xprof: loop-fusion share cut).
                entry = jnp.max(cand, axis=0)
                am = jnp.argmax(cand, axis=0)               # [E]
                U = (jax.lax.broadcasted_iota(jnp.int32, (K, nE), 0)
                     == am[None]).astype(jnp.float32)       # [K, E]
                pays_k = jnp.stack(
                    [ki.astype(jnp.float32),
                     ctx_k.astype(jnp.float32),
                     rw1_k.astype(jnp.float32),
                     rw2_k.astype(jnp.float32),
                     fb_k.astype(jnp.float32)], axis=1)     # [K, 5]
                sel = oh_matmul("kp,ke->ep", pays_k, U)  # [E, 5]
                prw_e, srcctx, srcrw1, srcrw2, fb_e = \
                    (sel[:, i] for i in range(5))
                ctxsel = jnp.sum(U * ctxrow, axis=0)        # [E]
                ctx_new = jnp.where(isfill_E, srcctx, ctxsel).astype(jnp.int32)
                erw1 = jnp.where(isreal_E, lmwid_E, srcrw1).astype(jnp.int32)
                # filler tokens inherit the source's full history; real words
                # shift it (h2' = h1_src).  h2 here is the LM-context h2
                # (identical to the true one whenever the (h2, h1) bigram
                # exists; LM-equivalent either way)
                erw2 = jnp.where(isreal_E, srcrw1, srcrw2).astype(jnp.int32)
                # new left-context class (per multi word) from the winning
                # source's final base phone: one-hot sum over CI phones
                if n_multi:
                    fbm = fb_e[:n_multi].astype(jnp.int32)
                    lccT = tables["lc_cls_T"]                # [n_ciph, Wm]
                    oh = jax.lax.broadcasted_iota(
                        jnp.int32, (n_ciph, n_multi), 0) == fbm[None, :]
                    var_new = jnp.sum(jnp.where(oh, lccT, 0), axis=0)
                else:
                    var_new = jnp.zeros(0, jnp.int32)
                tf_new = (t + 1).astype(jnp.int32)

                # ---------- apply entries ----------
                inc_segs = []          # pre-entry first-state incumbents
                off = 0
                for bi, ch in enumerate(self.chains):
                    e = newc["ch"][bi]
                    ent = entry[off:off + ch.Wb]
                    fm = ch_fm[bi]
                    inc_segs.append(jnp.sum(
                        jnp.where(fm, e["S"][0], 0.0), axis=0))
                    cand0 = jnp.where(fm, ent[None, :], NEG_INF)
                    win = cand0 > e["S"][0]
                    e["S"] = (jnp.where(win, cand0, e["S"][0]),) + e["S"][1:]
                    e["TF"] = (jnp.where(win, tf_new, e["TF"][0]),) + e["TF"][1:]
                    e["CTX"] = (jnp.where(
                        win, ctx_new[None, off:off + ch.Wb] *
                        jnp.ones((ch.D, 1), jnp.int32), e["CTX"][0]),) \
                        + e["CTX"][1:]
                    winv = jnp.sum(jnp.where(win & fm, 1, 0), axis=0) > 0
                    e["VAR"] = (jnp.where(winv, var_new[off:off + ch.Wb],
                                          e["VAR"][0]),) + e["VAR"][1:]
                    off += ch.Wb
                if SP:
                    ent = entry[n_multi:n_multi + SP]
                    e = sp_new
                    inc_segs.append(jnp.min(e["S"][0], axis=0))
                    win = ent[None, :] > e["S"][0]
                    e["S"] = (jnp.where(win, ent[None, :], e["S"][0]),) \
                        + e["S"][1:]
                    e["TF"] = (jnp.where(win, tf_new, e["TF"][0]),) + e["TF"][1:]
                    e["CTX"] = (jnp.where(
                        win, ctx_new[None, n_multi:n_multi + SP] *
                        jnp.ones((n_rc, 1), jnp.int32), e["CTX"][0]),) \
                        + e["CTX"][1:]
                off = n_multi + SP
                for bi, ch in enumerate(self.ci_chains):
                    e = newc["ci"][bi]
                    ent = entry[off:off + ch.Wb]
                    fm = ci_fm[bi]
                    inc_segs.append(jnp.sum(
                        jnp.where(fm, e["S"][0], 0.0), axis=0))
                    cand0 = jnp.where(fm, ent[None, :], NEG_INF)
                    win = cand0 > e["S"][0]
                    e["S"] = (jnp.where(win, cand0, e["S"][0]),) + e["S"][1:]
                    e["TF"] = (jnp.where(win, tf_new, e["TF"][0]),) + e["TF"][1:]
                    e["CTX"] = (jnp.where(
                        win, ctx_new[None, off:off + ch.Wb] *
                        jnp.ones((ch.D, 1), jnp.int32), e["CTX"][0]),) \
                        + e["CTX"][1:]
                    off += ch.Wb
                if fin_new is not None:
                    newc["fin"] = fin_new
                else:
                    newc["fin"] = None
                newc["sp"] = sp_new

                # ---------- top-K exactness guard ----------
                if K < W:
                    inc_E = jnp.concatenate(inc_segs)
                    best_alt = jnp.maximum(entry, inc_E)
                    gw_t = tables.get("guard_w")
                    if gw_t is not None:
                        # tightened bound: exact live exit scores (at
                        # the entry column's right-context plane) for
                        # the per-column top-J bonus predecessors (top-K
                        # members excluded — their candidates were
                        # computed exactly), kv[K-1] + (J+1)-th bonus
                        # for every other word, exact filler exits with
                        # the global bound (see _guard_tables)
                        intop = jnp.max(onek, axis=0)        # [W] 0/1
                        svf = sv.reshape(-1)                 # [n_rc*W]
                        ce = jnp.take(svf, tables["guard_wf"])  # [J, E]
                        live = jnp.take(intop, gw_t, axis=0) < 0.5
                        breal = jnp.max(
                            jnp.where(live, ce + tables["guard_v"],
                                      jnp.float32(NEG_INF)), axis=0)
                        # plane-local floor for every other word: the
                        # best EXCLUDED exit at the column's own
                        # right-context plane (<= kv[K-1], usually far
                        # less for weak planes)
                        sv_excl = jnp.where(intop[None, :] > 0,
                                            jnp.float32(NEG_INF), sv)
                        svmax_excl = jnp.max(sv_excl, axis=1)  # [n_rc]
                        plane_E = jnp.take(svmax_excl,
                                           tables["f0p_E"])   # [E]
                        if GM:
                            # ranks K..K+GM: exact per-word bonus rows
                            # (fillers inherit contexts -> global maxb)
                            wm = ki2[K:]                      # [M]
                            svm = jnp.take(
                                svf, wm[:, None]
                                + tables["f0p_E"][None, :] * W)
                            lmw = jnp.take(tables["col_lm_W"], wm)
                            brow = jnp.take(tables["guard_bmax"],
                                            lmw, axis=0)      # [M, E]
                            isf = jnp.take(tables["isfill_W"], wm)
                            brow = jnp.where(isf[:, None],
                                             maxb_E[None, :], brow)
                            breal = jnp.maximum(
                                breal, jnp.max(svm + brow, axis=0))
                            rest_kv = kv2[K + GM - 1]
                        else:
                            rest_kv = kv[K - 1]
                        breal = jnp.maximum(
                            breal,
                            jnp.minimum(plane_E, rest_kv)
                            + tables["guard_rest"])
                        fillw_t = tables["guard_fillw"]
                        if fillw_t.shape[0]:
                            fsv = jnp.take(svf, tables["guard_fillwf"])
                            flive = (jnp.take(intop, fillw_t)
                                     < 0.5)[:, None]
                            fbest = jnp.max(jnp.where(
                                flive, fsv, jnp.float32(NEG_INF)),
                                axis=0)                      # [E]
                            breal = jnp.maximum(breal, fbest + maxb_E)
                        bound = jnp.where(isfill_E,
                                          kv[K - 1] + fillpen_E,
                                          breal + wpen)
                    else:
                        bound = kv[K - 1] + jnp.where(
                            isfill_E, fillpen_E, maxb_E + wpen)
                    nviol = jnp.sum(((bound > best_alt)
                                     & (best_alt > NEG_INF / 2)
                                     & valid).astype(jnp.int32))
                else:
                    nviol = jnp.int32(0)

                # ---------- renormalize ----------
                def all_s(c):
                    xs_ = []
                    for e in c["ch"] + c["ci"]:
                        xs_ += [jnp.max(s) for s in e["S"]]
                    if c["fin"] is not None:
                        xs_ += [jnp.max(s) for s in c["fin"]["S"]]
                    if c["sp"] is not None:
                        xs_ += [jnp.max(s) for s in c["sp"]["S"]]
                    return jnp.max(jnp.stack(xs_))

                m = jnp.maximum(all_s(newc), jnp.float32(NEG_INF))

                def renorm(c):
                    for e in c["ch"] + c["ci"] + (
                            [c["fin"]] if c["fin"] is not None else []) + (
                            [c["sp"]] if c["sp"] is not None else []):
                        if isinstance(e["S"], tuple):
                            e["S"] = tuple(s - m for s in e["S"])
                        else:              # stacked pallas-fan planes
                            e["S"] = e["S"] - m
                    return c

                newc = renorm(newc)
                if mask_carry:
                    newc = jax.tree.map(
                        lambda new, old: jnp.where(valid, new, old),
                        newc, carry)
                if minimal:
                    # top-(K+1) exit records + [E] winner-rank map (see
                    # _make_scan docstring).  Slot K pins the finish
                    # word's exit so the final-frame selection can
                    # prefer </s> exactly like the full backtrace.
                    fi = (self.finish_idx
                          if self.finish_idx is not None else 0)
                    payk2 = oh_matmul(
                        "wp,kw->kp",
                        jnp.stack([etf_w.astype(jnp.float32),
                                   etgt_w.astype(jnp.float32)], axis=1),
                        onek)                             # [K, 2]
                    kv_x = jnp.concatenate([kv, escore[fi][None]])
                    ki_x = jnp.concatenate(
                        [ki.astype(jnp.int32), jnp.int32(fi)[None]])
                    etf_x = jnp.concatenate(
                        [payk2[:, 0].astype(jnp.int32), etf_w[fi][None]])
                    etgt_x = jnp.concatenate(
                        [payk2[:, 1].astype(jnp.int32),
                         etgt_w[fi][None]])
                    rank = jnp.where(entry > NEG_INF / 2, am,
                                     255).astype(jnp.uint8)
                    rec = (kv_x, ki_x, etf_x, etgt_x, rank, m, nviol)
                else:
                    rec = (escore, etf_w, etgt_w, ecx_w,
                           entry, prw_e.astype(jnp.int32), erw1, erw2, m,
                           nviol)
                return newc, rec

            return step

        CHp = CH

        def scan_fn(costs, valid, carry, t0, tables):
            step = make_step(tables)
            T = costs.shape[0]
            Tp = -(-T // CHp) * CHp
            costs = jnp.pad(costs, ((0, Tp - T), (0, 0)))
            valid = jnp.pad(valid, (0, Tp - T))
            tarr = t0 + jnp.arange(Tp, dtype=jnp.int32)
            cc = costs.reshape(Tp // CHp, CHp, -1)
            vv = valid.reshape(Tp // CHp, CHp)
            tt = tarr.reshape(Tp // CHp, CHp)

            def outer(c, xch):
                cchunk, vchunk, tchunk = xch
                # barrier: keep the pre-gather INSIDE the outer scan.
                # Without it XLA's LICM rewrites gather(slice(costs)) as
                # slice(gather(costs)) and materializes the expansion for
                # the whole utterance at once — a [N_flat, n_chunks, CH]
                # intermediate whose (8,128) tile padding overflows HBM
                # at 20k-word scale (observed: 19 GB for a 900 MB array).
                cchunk = jax.lax.optimization_barrier(cchunk)
                g = cchunk[:, tables["senid_all"]]  # [CH, N_flat] pre-gather
                c, ys = jax.lax.scan(step, c, (g, tchunk, vchunk))
                return c, ys

            carry_out, recs = jax.lax.scan(
                outer, self.init_carry if carry is None else carry,
                (cc, vv, tt))
            recs = jax.tree.map(
                lambda r: r.reshape((Tp,) + r.shape[2:]), recs)
            return recs, carry_out

        jitted = jax.jit(scan_fn)
        # Materialize the LM tables on device EAGERLY (_make_scan always
        # runs outside jit): a lazy first-use cache would capture tracers
        # when `run` is first called inside an outer jit trace (as the
        # batch pipeline does) and leak them across retraces.  Shared
        # between the full and minimal scan variants.
        if getattr(self, "_dev_tables", None) is None:
            self._dev_tables = {k: jnp.asarray(v)
                                for k, v in dev_tables.items()}

        def dev_tabs():
            return self._dev_tables

        def run(costs, valid):
            return jitted(costs, valid, None, 0, dev_tabs())[0]

        def with_carry(costs, valid, carry=None, t0=0):
            if not mask_carry:
                # carry reuse across calls requires the masked variant
                # (padding frames must not advance the carry)
                return self._make_scan(minimal, mask_carry=True) \
                    .with_carry(costs, valid, carry, t0)
            return jitted(costs, valid, carry, t0, dev_tabs())

        def with_tables(costs, valid, tables):
            """For callers that wrap the scan in an OUTER jit: pass
            self._dev_tables through the outer jit's arguments and into
            here, otherwise the tables are re-captured as constants of
            the outer program (GBs of constants; remote-compile HTTP
            413)."""
            return jitted(costs, valid, None, 0, tables)[0]

        run.with_carry = with_carry
        run.with_tables = with_tables
        self._scan_fn[(minimal, mask_carry)] = run
        return run

    # -- device backtrace ----------------------------------------------------

    def _make_backtrace_jax(self):
        """Jitted on-device 1-best backtrace over the RAW scan records.

        The round-2 design transferred every per-frame record array to
        the host before walking the path — ~0.5 GB per utterance at 20k
        words, the dominant cost of a hyp-only decode through the
        tunneled TPU (round-3 'wer20k.throughput' gap).  The walk is a
        `lax.while_loop` of at most one step per word segment doing two
        scalar gathers per step: the (frame, word) -> (entry frame,
        entry target) join that `adapt_records` materializes densely is
        evaluated lazily only along the best path.  Only a [T, 3] i32
        segment table leaves the device.  Segment semantics match
        NgramFlatDecoder._backtrace / native/ps_native.c backtrace
        exactly (src/ngram_search.c bptbl walk)."""
        if self._bt_fn.get(False) is not None:
            return self._bt_fn[False]
        import jax
        import jax.numpy as jnp

        finish = self.finish_idx if self.finish_idx is not None else -1

        @jax.jit
        def bt(escore, etf, etgt, eprw, nf):
            T = escore.shape[0]
            last = escore[nf - 1]
            w0 = jnp.argmax(last).astype(jnp.int32)
            if finish >= 0:
                w0 = jnp.where(last[finish] > NEG_INF / 2,
                               jnp.int32(finish), w0)
            out0 = jnp.full((T, 3), -1, jnp.int32)

            def cond(st):
                t, w, i, done, out = st
                return (~done) & (i < T)

            def body(st):
                t, w, i, done, out = st
                s = etf[t, w]
                tg = etgt[t, w]
                p = jnp.where(s > 0, eprw[jnp.maximum(s - 1, 0), tg],
                              jnp.int32(-1))
                out = out.at[i].set(jnp.stack([w, s, t]))
                done = (s <= 0) | (p < 0)
                return (s - 1, p, i + 1, done, out)

            t0 = (nf - 1).astype(jnp.int32)
            _, _, n, _, out = jax.lax.while_loop(
                cond, body, (t0, w0, jnp.int32(0), jnp.bool_(False), out0))
            return out, n, last[w0]

        self._bt_fn[False] = bt
        return bt

    def _make_backtrace_min(self):
        """Device backtrace over MINIMAL (top-K-compressed) records:
        kv/ki/etf/etgt [T, K+1] + rank [T, E] uint8.  The walk carries
        the top-K RANK instead of the word id (path predecessors are
        always shortlist members; see _make_scan minimal docstring)."""
        if self._bt_fn.get(True) is not None:
            return self._bt_fn[True]
        import jax
        import jax.numpy as jnp

        has_finish = self.finish_idx is not None
        K1 = min(self.topk, self.W) + 1

        @jax.jit
        def bt(kv, ki, etf, etgt, rank, nf):
            T = kv.shape[0]
            last = kv[nf - 1]
            r0 = jnp.argmax(last[:K1 - 1]).astype(jnp.int32)
            if has_finish:
                r0 = jnp.where(last[K1 - 1] > NEG_INF / 2,
                               jnp.int32(K1 - 1), r0)
            out0 = jnp.full((T, 3), -1, jnp.int32)

            def cond(st):
                t, r, i, done, out = st
                return (~done) & (i < T)

            def body(st):
                t, r, i, done, out = st
                w = ki[t, r]
                s = etf[t, r]
                tg = etgt[t, r]
                pr = jnp.where(
                    s > 0,
                    rank[jnp.maximum(s - 1, 0), tg].astype(jnp.int32),
                    jnp.int32(255))
                out = out.at[i].set(jnp.stack([w, s, t]))
                done = (s <= 0) | (pr >= K1 - 1)
                return (s - 1, pr, i + 1, done, out)

            t0 = (nf - 1).astype(jnp.int32)
            _, _, n, _, out = jax.lax.while_loop(
                cond, body, (t0, r0, jnp.int32(0), jnp.bool_(False), out0))
            return out, n, last[r0]

        self._bt_fn[True] = bt
        return bt

    def _segs_from_table(self, table, n):
        """[n, 3] (word, start, end) rows (reverse order) -> (hyp, segs)."""
        segs = []
        for i in range(int(n) - 1, -1, -1):
            wi, s, t = (int(x) for x in table[i])
            segs.append(Seg(word=self.dict.wordstr(self.words[wi]),
                            start=s, end=t))
        out = []
        for s in segs:
            wid = self.dict.wordid(s.word)
            if wid < 0 or self.dict.is_filler(wid):
                continue
            out.append(self.dict.basestr(wid))
        return " ".join(out), segs

    # -- records adapter -----------------------------------------------------

    @property
    def records(self):
        """Adapted per-frame records (escore, estf, eprw, eascr, eh1,
        eh2, ectx).  Computed lazily: the dense [T, W]/[T, E] arrays
        only leave the device when a consumer (lattice, bestpath,
        tests) actually asks."""
        r = self._records
        if callable(r):
            r = r()
            self._records = r
        return r

    @records.setter
    def records(self, value):
        self._records = value

    @property
    def raw_records(self):
        r = self._raw_records
        if callable(r):
            r = r()
            self._raw_records = r
        return r

    @raw_records.setter
    def raw_records(self, value):
        self._raw_records = value

    def adapt_records(self, raw, T):
        """Join raw scan records into the round-2 flat-record format
        (escore, estf, eprw, eascr, eh1, eh2, ectx) [T, W] consumed by
        the lattice layer, backtrace, and tests."""
        escore, etf, etgt, ectx, entv, eprw, erw1, erw2, m = \
            [np.asarray(r)[:T] for r in raw[:9]]
        Tn = escore.shape[0]
        Mcp = np.concatenate([[0.0], np.cumsum(m)])  # Mcp[t] = sum m[<t]
        tf = etf.astype(np.int64)
        tg = etgt.astype(np.int64)
        tfi = np.clip(tf - 1, 0, Tn - 1)
        has = tf > 0
        eprw_x = np.where(has, eprw[tfi, tg], -1).astype(np.int32)
        entv_x = np.where(has, entv[tfi, tg], 0.0)
        corr = Mcp[np.arange(Tn)][:, None] - np.where(has, Mcp[tfi], 0.0)
        eascr = (escore - entv_x + corr).astype(np.float32)
        s_lm = self.lm.wid("<s>") if self.start_idx is not None else -1
        eh1 = np.where(has, erw1[tfi, tg], max(s_lm, 0)).astype(np.int32)
        eh2 = np.where(has, erw2[tfi, tg], self.V).astype(np.int32)
        return (escore.astype(np.float32), tf.astype(np.int32), eprw_x,
                eascr, eh1, eh2, ectx.astype(np.int32))

    # -- decode --------------------------------------------------------------

    def decode(self, feats, costs=None):
        import jax.numpy as jnp
        from ..models.acoustic import senone_scores_jax

        if costs is None:
            costs = senone_scores_jax(
                self.am.scoring_arrays, self.am.cb_groups,
                np.asarray(feats)[None].astype(np.float32))[0]
        costs = jnp.asarray(costs)
        T = costs.shape[0]
        raw = self._make_scan()(costs, jnp.ones(T, bool))
        self.raw_records = lambda: tuple(np.asarray(r) for r in raw)
        self.records = lambda: self.adapt_records(self.raw_records, T)
        # top-K exactness guard count ([T] i32, tiny transfer)
        self.guard_violations = int(np.asarray(raw[9])[:T].sum())
        # 1-best path entirely on device; records transfer only if a
        # lattice/bestpath consumer touches .records afterwards
        table, n, sc = self._make_backtrace_jax()(
            raw[0], raw[1], raw[2], raw[5], jnp.int32(T))
        # un-renormalized path score: final winner score + the per-frame
        # renorm offsets the scan subtracted (src/ngram_search.c:545
        # bp_hyp fills the hyp score from the backtrace the same way)
        self.hyp_score = float(np.asarray(sc)) \
            + float(np.asarray(raw[8])[:T - 1].sum())
        return self._segs_from_table(np.asarray(table), int(n))

    def decode_batch(self, feats, n_frames, keep_records=True):
        """Batched decode.  keep_records=False uses the top-K-compressed
        minimal record stream (~30x less HBM; long-utterance corpora
        OOM with full [T, E] records) — `batch_records`/lattices are
        then unavailable for this batch."""
        import jax
        import jax.numpy as jnp
        from ..models.acoustic import senone_scores_jax

        minimal = not keep_records and min(self.topk, self.W) <= 254
        if not keep_records and not minimal:
            import warnings
            warnings.warn(
                f"keep_records=False requested but topk={self.topk} "
                f"exceeds the uint8 rank-map limit (254): falling back "
                f"to full [T, E] records, which may OOM on long "
                f"utterances. Lower topk to restore minimal records.",
                RuntimeWarning, stacklevel=2)
        feats = jnp.asarray(feats)
        B, T = feats.shape[:2]
        n_frames = jnp.asarray(n_frames)
        # time_chunk bounds the [B, chunk, CB, F, D] scoring
        # intermediate: unchunked it reaches GBs on long-utterance
        # batches (~2.3 GB at B=8, T=4400 on en-us) and OOMs the chip
        costs = senone_scores_jax(self.am.scoring_arrays,
                                  self.am.cb_groups, feats,
                                  time_chunk=16)
        valid = jnp.arange(T)[None, :] < n_frames[:, None]
        raw = jax.vmap(self._make_scan(minimal=minimal))(costs, valid)
        nf = np.asarray(n_frames)
        if minimal:
            tables, ns, scs = jax.vmap(self._make_backtrace_min())(
                raw[0], raw[1], raw[2], raw[3], raw[4],
                n_frames.astype(jnp.int32))
            viol = np.asarray(raw[6])
            m_rec = np.asarray(raw[5])
            self.batch_records = None
        else:
            tables, ns, scs = jax.vmap(self._make_backtrace_jax())(
                raw[0], raw[1], raw[2], raw[5],
                n_frames.astype(jnp.int32))
            viol = np.asarray(raw[9])
            m_rec = np.asarray(raw[8])
            self.batch_records = _LazyBatchRecords(self, raw, nf)
        tables = np.asarray(tables)
        ns = np.asarray(ns)
        scs = np.asarray(scs)
        self.hyp_scores = [
            float(scs[b]) + float(m_rec[b, :max(nf[b] - 1, 0)].sum())
            for b in range(B)]
        self.guard_violations_batch = [
            int(viol[b, :nf[b]].sum()) for b in range(B)]
        self.guard_violations = int(sum(self.guard_violations_batch))
        return [self._segs_from_table(tables[b], int(ns[b]))
                for b in range(B)]

    def _backtrace(self, recs, T):
        if len(recs) >= 9:       # raw records (e.g. parallel pipeline)
            recs = self.adapt_records(recs, T)
        from .ngram_flat import NgramFlatDecoder
        return NgramFlatDecoder._backtrace(self, recs, T)
