"""Allphone (phoneme) decoding: loop over phone HMMs with an optional
phone-bigram LM (src/allphone_search.c re-design).

With -allphone_ci (default), the network is the CI phone set; each frame
every phone HMM updates densely, phone transitions apply the phone LM
bigram (phone names as LM "words") or a uniform phone-insertion penalty,
and dense per-frame exit records feed the host backtrace into a phone
segmentation (phseg_t equivalent).

With -allphone_ci no, the network is the reference's PHMM graph
(phmm_build, src/allphone_search.c:220-316): one node per unique
(ci, ssid, tmat) among all triphones, with left/right-context CI bitmaps
(fillers mapped to every filler).  The reference links nodes pairwise
(phmm_link :167-216); here the transition factors through CI classes --
node p -> node q is allowed iff rc[p] contains ci(q) and lc[q] contains
ci(p), so a frame's update is two dense [N, n_ci] masked reductions
around the [n_ci, n_ci] bigram matrix instead of a pointer walk.
"""

from __future__ import annotations

import math

import numpy as np

from ..models.acoustic import AcousticModel, UNIT_NATS
from ..lm.ngram import NgramModel
from .ngram_flat import Seg
from ..ops.hmm import hmm_step, propagate_meta, out_meta as hmm_out_meta

NEG_INF = -1e30
SHIFT = 1 << 10


class AllphoneDecoder:
    def __init__(self, am: AcousticModel, lm: NgramModel | None = None,
                 ci_only: bool = True, pip: float = 1.0):
        self.am = am
        self.mdef = am.mdef
        self.lm = lm
        self.ci_only = ci_only
        self.pip = math.log(pip) / UNIT_NATS
        self._build_bigram()
        if ci_only:
            self._build_ci()
        else:
            self._build_tri()

    def _build_bigram(self):
        """[n_ci, n_ci] phone-bigram transition matrix in shifted units."""
        mdef = self.mdef
        nci = mdef.n_ciphone
        if self.lm is not None:
            lmw = np.full(nci, -1, np.int32)
            for p in range(nci):
                lmw[p] = self.lm.wid(mdef.ciname[p])
            M = np.zeros((nci, nci), np.float32)
            for a in range(nci):
                if lmw[a] >= 0:
                    row = self.lm.successor_row((int(lmw[a]),))
                    M[a] = np.where(lmw >= 0,
                                    row[np.maximum(lmw, 0)],
                                    row.min())
                else:
                    uni = self.lm.successor_row(())
                    M[a] = np.where(lmw >= 0, uni[np.maximum(lmw, 0)],
                                    uni.min())
            self.M = M / SHIFT + self.pip
        else:
            self.M = np.full((nci, nci), self.pip, np.float32)

    def _build_ci(self):
        mdef = self.mdef
        nci = mdef.n_ciphone
        self.n_node = nci
        self.node_ci = np.arange(nci, dtype=np.int32)
        self.senid = mdef.sseq[mdef.phone_ssid[:nci]].astype(np.int32)
        tpc = self.am.tmat.tp[mdef.phone_tmat[:nci]].astype(np.float32)
        self.tp = np.where(tpc == 255, NEG_INF, -tpc)
        # CI nodes accept any context
        self.lcmask = np.ones((nci, nci), bool)
        self.rcmask = np.ones((nci, nci), bool)

    def _build_tri(self):
        """PHMM net over unique (ci, ssid, tmat) with context bitmaps."""
        mdef = self.mdef
        nci = mdef.n_ciphone
        fillers = np.nonzero(mdef.phone_filler[:nci])[0]
        key2node: dict[tuple, int] = {}
        node_ci, node_ssid, node_tmat = [], [], []
        # CI phones first (mirrors the reference's pid order); their
        # bitmaps are all-set
        pid_ci = np.concatenate([np.arange(nci), mdef.phone_ci[nci:]])
        for pid in range(mdef.n_phone):
            k = (int(pid_ci[pid]), int(mdef.phone_ssid[pid]),
                 int(mdef.phone_tmat[pid]))
            if k not in key2node:
                key2node[k] = len(node_ci)
                node_ci.append(k[0])
                node_ssid.append(k[1])
                node_tmat.append(k[2])
        N = len(node_ci)
        self.n_node = N
        self.node_ci = np.asarray(node_ci, np.int32)
        lcmask = np.zeros((N, nci), bool)
        rcmask = np.zeros((N, nci), bool)
        lcmask[:nci] = True            # CI nodes connect to everything
        rcmask[:nci] = True
        for pid in range(nci, mdef.n_phone):
            n = key2node[(int(pid_ci[pid]), int(mdef.phone_ssid[pid]),
                          int(mdef.phone_tmat[pid]))]
            lc, rc = int(mdef.phone_lc[pid]), int(mdef.phone_rc[pid])
            # fillers map to every filler (phmm_build :289-306)
            if mdef.phone_filler[lc]:
                lcmask[n, fillers] = True
            else:
                lcmask[n, lc] = True
            if mdef.phone_filler[rc]:
                rcmask[n, fillers] = True
            else:
                rcmask[n, rc] = True
        self.lcmask = lcmask
        self.rcmask = rcmask
        self.senid = mdef.sseq[np.asarray(node_ssid)].astype(np.int32)
        tpc = self.am.tmat.tp[np.asarray(node_tmat)].astype(np.float32)
        self.tp = np.where(tpc == 255, NEG_INF, -tpc)

    def decode(self, feats: np.ndarray, costs: np.ndarray | None = None):
        import jax
        import jax.numpy as jnp
        from ..models.acoustic import senone_scores_jax

        if costs is None:
            costs = senone_scores_jax(
                self.am.scoring_arrays, self.am.cb_groups,
                np.asarray(feats)[None].astype(np.float32))[0]
        costs = jnp.asarray(costs)
        T = costs.shape[0]
        N = self.n_node
        nci = self.mdef.n_ciphone
        NST = self.mdef.n_emit_state
        sen = -costs[:, self.senid.reshape(-1)].reshape(T, N, NST)
        tp = jnp.asarray(self.tp)
        M = jnp.asarray(self.M)                        # [c1, c2]
        ci_ids = jnp.asarray(self.node_ci)
        node_ci = self.node_ci
        lc_add = jnp.where(jnp.asarray(self.lcmask), 0.0, NEG_INF)  # [N,c1]
        rc_add = jnp.where(jnp.asarray(self.rcmask), 0.0, NEG_INF)  # [N,c2]

        def step(carry, xs):
            S, STF, PRC = carry
            sen_t, t = xs
            newS, srcm, out, out_src = hmm_step(S, sen_t, tp)
            out_stf = hmm_out_meta(STF, out_src)
            newSTF = propagate_meta(STF, srcm)
            newPRC = propagate_meta(PRC, srcm)
            # factored node->node transition: source side folds exits
            # into [c1, c2] (best exit of a ci-c1 node allowing rc c2)
            masked = out[:, None] + rc_add                      # [N, c2]
            B = jax.ops.segment_max(masked, ci_ids, num_segments=nci,
                                    indices_are_sorted=False)  # [c1, c2]
            trans = jnp.maximum(B, NEG_INF) + M                # [c1, c2]
            # destination side: best incoming ci class per node
            cand = trans[:, node_ci].T + lc_add                # [N, c1]
            ent_ci = jnp.argmax(cand, axis=1)
            entry = jnp.max(cand, axis=1)
            win = entry > newS[:, 0]
            newS = newS.at[:, 0].set(jnp.where(win, entry, newS[:, 0]))
            newSTF = newSTF.at[:, 0].set(jnp.where(win, t + 1,
                                                   newSTF[:, 0]))
            newPRC = newPRC.at[:, 0].set(
                jnp.where(win, ent_ci.astype(jnp.int32), newPRC[:, 0]))
            m = jnp.max(newS)
            return (newS - m, newSTF, newPRC), (out, out_stf,
                                                hmm_out_meta(PRC, out_src))

        S0 = np.full((N, NST), NEG_INF, np.float32)
        S0[:, 0] = 0.0     # any phone may start
        STF0 = np.zeros((N, NST), np.int32)
        PRC0 = np.full((N, NST), -1, np.int32)
        _, (eout, estf, eprc) = jax.lax.scan(
            step, (jnp.asarray(S0), jnp.asarray(STF0), jnp.asarray(PRC0)),
            (sen, jnp.arange(T, dtype=jnp.int32)))
        eout, estf, eprc = (np.asarray(x) for x in (eout, estf, eprc))
        return self._backtrace(eout, estf, eprc, T)

    def _backtrace(self, eout, estf, eprc, T):
        """Host backtrace: follow (start frame, predecessor CI class)
        records; within a class the predecessor node is the argmax exit
        that allows the current node's CI as right context."""
        node_ci = self.node_ci
        rcmask = self.rcmask
        p = int(np.argmax(eout[T - 1]))
        segs = []
        t = T - 1
        while t >= 0 and p >= 0:
            s = int(estf[t, p])
            segs.append(Seg(word=self.mdef.ciname[node_ci[p]],
                            start=s, end=t))
            c1 = int(eprc[t, p])
            if s <= 0 or c1 < 0:
                break
            cand = np.where((node_ci == c1) & rcmask[:, node_ci[p]],
                            eout[s - 1], NEG_INF)
            p = int(np.argmax(cand))
            t = s - 1
        segs.reverse()
        return " ".join(s.word for s in segs), segs
