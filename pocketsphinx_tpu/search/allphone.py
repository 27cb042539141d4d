"""Allphone (phoneme) decoding: loop over phone HMMs with an optional
phone-bigram LM (src/allphone_search.c re-design).

With -allphone_ci (default), the network is the CI phone set; each frame
every phone HMM updates densely, phone transitions apply the phone LM
bigram (phone names as LM "words") or a uniform phone-insertion penalty,
and dense per-frame exit records feed the host backtrace into a phone
segmentation (phseg_t equivalent).
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
        self.pip = math.log(pip) / UNIT_NATS
        if not ci_only:
            raise NotImplementedError(
                "triphone allphone networks not yet supported")
        self._build()

    def _build(self):
        mdef = self.mdef
        nci = mdef.n_ciphone
        self.n_phone = nci
        self.senid = mdef.sseq[mdef.phone_ssid[:nci]].astype(np.int32)
        tpc = self.am.tmat.tp[mdef.phone_tmat[:nci]].astype(np.float32)
        self.tp = np.where(tpc == 255, NEG_INF, -tpc)
        # phone-bigram transition matrix [P, P] in shifted units
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
        P = self.n_phone
        NST = self.mdef.n_emit_state
        sen = -costs[:, self.senid.reshape(-1)].reshape(T, P, NST)
        tp = jnp.asarray(self.tp)
        M = jnp.asarray(self.M)

        def step(carry, xs):
            S, STF, PRP = carry
            sen_t, t = xs
            newS, srcm, out, out_src = hmm_step(S, sen_t, tp)
            out_stf = hmm_out_meta(STF, out_src)
            out_prp = hmm_out_meta(PRP, out_src)
            newSTF = propagate_meta(STF, srcm)
            newPRP = propagate_meta(PRP, srcm)
            trans = out[:, None] + M                      # [from, to]
            ent_src = jnp.argmax(trans, axis=0)
            entry = jnp.max(trans, axis=0)
            win = entry > newS[:, 0]
            newS = newS.at[:, 0].set(jnp.where(win, entry, newS[:, 0]))
            newSTF = newSTF.at[:, 0].set(jnp.where(win, t + 1,
                                                   newSTF[:, 0]))
            newPRP = newPRP.at[:, 0].set(jnp.where(win, ent_src,
                                                   newPRP[:, 0]))
            m = jnp.max(newS)
            return (newS - m, newSTF, newPRP), (out, out_stf, out_prp)

        S0 = np.full((P, NST), NEG_INF, np.float32)
        S0[:, 0] = 0.0     # any phone may start
        STF0 = np.zeros((P, NST), np.int32)
        PRP0 = np.full((P, NST), -1, np.int32)
        _, (eout, estf, eprp) = jax.lax.scan(
            step, (jnp.asarray(S0), jnp.asarray(STF0), jnp.asarray(PRP0)),
            (sen, jnp.arange(T, dtype=jnp.int32)))
        eout, estf, eprp = (np.asarray(x) for x in (eout, estf, eprp))
        p = int(np.argmax(eout[T - 1]))
        segs = []
        t = T - 1
        while t >= 0 and p >= 0:
            s = int(estf[t, p])
            segs.append(Seg(word=self.mdef.ciname[p], start=s, end=t))
            nxt = int(eprp[t, p])
            if s <= 0 or nxt < 0:
                break
            p = nxt
            t = s - 1
        segs.reverse()
        return " ".join(s.word for s in segs), segs
