"""FSG decoding: dense Viterbi over grammar arcs (src/fsg_search.c,
fsg_lextree.c, fsg_history.c re-design).

Every word-labeled grammar arc owns a dense HMM chain on the device
(word-instance-per-arc, like the reference's per-FSG-state lextrees but
flattened to arrays).  Epsilon transitions are folded into a static
best-path closure matrix, so one [A, A] max-plus product per frame
implements all state traversal: entry(b) = max_a exit_a(class f0(b)) +
closure[dst(a), src(b)] + logprob(b) + wip + pip (the pnode logs2prob
composition of src/fsg_lextree.c:428-430).

Silence/filler self-loops (fsg_search_add_silences, src/fsg_search.c:
87-145) and alternate pronunciations (add_altpron :147-170) are applied
to the grammar before compilation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..models.dict2pid import Dict2Pid
from ..models.acoustic import AcousticModel, UNIT_NATS
from ..lm.fsg import FsgModel
from .ngram_flat import Seg
from ..ops.hmm import hmm_step, propagate_meta, out_meta as hmm_out_meta

NEG_INF = -1e30
SHIFT = 1 << 10


class FsgDecoder:
    def __init__(self, am: AcousticModel, d2p: Dict2Pid, fsg: FsgModel,
                 wip: float = 0.65, pip: float = 1.0,
                 silprob: float = 0.005, fillprob: float = 1e-8,
                 use_filler: bool = True, use_altpron: bool = True):
        self.am = am
        self.d2p = d2p
        self.dict = d2p.dict
        self.mdef = am.mdef
        self.fsg = fsg
        ln = lambda p: math.log(p) / UNIT_NATS
        # the FSG search scales wip/pip by lw, unlike the n-gram search
        # (fsg_search.c:208-217: logmath_log(wip) * lw >> SENSCR_SHIFT)
        self.wip = ln(wip) * fsg.lw
        self.pip = ln(pip) * fsg.lw
        if use_filler:
            # add <sil> everywhere plus the other filler-dictionary words
            fsg.add_silence("<sil>", -1, silprob)
            for wid in range(len(self.dict)):
                if (self.dict.filler[wid]
                        and wid not in (self.dict.silwid,
                                        self.dict.startwid,
                                        self.dict.finishwid)):
                    fsg.add_silence(self.dict.wordstr(wid), -1, fillprob)
        if use_altpron:
            for w in list(fsg.vocab):
                wid = self.dict.wordid(w)
                if wid < 0:
                    continue
                for alt in self.dict.alternates(wid):
                    astr = self.dict.wordstr(alt)
                    if astr != self.dict._norm(w):
                        fsg.add_alt(w, astr)
        self._build()

    def _build(self):
        d, mdef, d2p, fsg = self.dict, self.mdef, self.d2p, self.fsg
        sil = mdef.sil
        arcs = []            # (link, dict wid)
        for l in fsg.links:
            if l.wid < 0:
                continue
            wid = d.wordid(fsg.vocab[l.wid])
            if wid < 0:
                continue     # word not in dictionary: arc unusable
            arcs.append((l, wid))
        if not arcs:
            raise ValueError("FSG has no decodable word transitions")
        self.arcs = arcs
        A = len(arcs)
        self.A = A
        # lattice-builder interface: per-"word" (arc) dict wid
        self.words = [wid for _, wid in arcs]
        self.start_idx = None

        from ..models.chains import ChainRows, append_word_chain
        rows = ChainRows()
        first_node = np.zeros(A, np.int32)
        final_base = np.zeros(A, np.int32)
        cls_map = np.zeros((A, mdef.n_ciphone), np.int16)
        f0_arr = np.zeros(A, np.int32)
        for i, (l, wid) in enumerate(arcs):
            f0_arr[i] = int(d.pron(wid)[0])
            fn, fb, nc, cr = append_word_chain(rows, d, mdef, d2p, wid, i,
                                               mdef.n_ciphone)
            first_node[i] = fn
            final_base[i] = fb
            cls_map[i] = cr
        senid_rows = rows.senid
        chain_pred = rows.chain_pred
        node_arc = rows.owner
        tmat_rows = rows.tmat

        self.P = len(senid_rows)
        self.senid = np.asarray(senid_rows, np.int32)
        tpc = self.am.tmat.tp[np.asarray(tmat_rows)].astype(np.float32)
        self.tp = np.where(tpc == 255, NEG_INF, -tpc)
        self.chain_pred = np.asarray(chain_pred, np.int32)
        self.node_arc = np.asarray(node_arc, np.int32)
        self.first_node = first_node
        # exit node per (arc a, next arc b): class of b's first phone
        self.exit_node = (final_base[:, None]
                          + cls_map[np.arange(A)[:, None],
                                    f0_arr[None, :]].astype(np.int32))
        self.exit_node_sil = (final_base
                              + cls_map[np.arange(A), sil].astype(np.int32))

        # arc-to-arc transition matrix via null closure (shifted units)
        C = fsg.null_closure() / SHIFT
        lp = np.array([l.logprob for l, _ in arcs]) / SHIFT
        dsts = np.array([l.dst for l, _ in arcs])
        srcs = np.array([l.src for l, _ in arcs])
        self.M = (C[dsts[:, None], srcs[None, :]]
                  + lp[None, :] + self.wip + self.pip).astype(np.float32)
        # entry from the start state; exit reach to the final state
        self.start_entry = (C[fsg.start_state, srcs] + lp
                            + self.wip + self.pip).astype(np.float32)
        self.final_reach = C[dsts, fsg.final_state].astype(np.float32)

    # -- decode --------------------------------------------------------------

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
        P, A = self.P, self.A
        NST = self.mdef.n_emit_state
        sen = -costs[:, self.senid.reshape(-1)].reshape(T, P, NST)
        tp = jnp.asarray(self.tp)
        chain_pred = jnp.asarray(np.maximum(self.chain_pred, 0))
        has_pred = jnp.asarray(self.chain_pred >= 0)
        entry_nodes = np.nonzero(self.chain_pred < 0)[0]
        entry_arcs = self.node_arc[entry_nodes]
        en_j = jnp.asarray(entry_nodes)
        ea_j = jnp.asarray(entry_arcs)
        exit_node = jnp.asarray(self.exit_node)
        exit_node_sil = jnp.asarray(self.exit_node_sil)
        M = jnp.asarray(self.M)
        final_reach = jnp.asarray(self.final_reach)

        def step(carry, xs):
            S, STF, PRA, ENTV = carry
            sen_t, t = xs
            newS, srcm, out, out_src = hmm_step(S, sen_t, tp)
            out_stf = hmm_out_meta(STF, out_src)
            out_pra = hmm_out_meta(PRA, out_src)
            out_entv = hmm_out_meta(ENTV, out_src)
            newSTF = propagate_meta(STF, srcm)
            newPRA = propagate_meta(PRA, srcm)
            newENTV = propagate_meta(ENTV, srcm)
            chain_entry = jnp.where(has_pred, out[chain_pred] + self.pip,
                                    NEG_INF)
            ch_win = chain_entry > newS[:, 0]
            newS = newS.at[:, 0].set(jnp.where(ch_win, chain_entry,
                                               newS[:, 0]))
            newSTF = newSTF.at[:, 0].set(
                jnp.where(ch_win, out_stf[chain_pred], newSTF[:, 0]))
            newPRA = newPRA.at[:, 0].set(
                jnp.where(ch_win, out_pra[chain_pred], newPRA[:, 0]))
            newENTV = newENTV.at[:, 0].set(
                jnp.where(ch_win, out_entv[chain_pred], newENTV[:, 0]))

            exg = out[exit_node]                       # [A, A]
            escore = out[exit_node_sil]
            estf = out_stf[exit_node_sil]
            epra = out_pra[exit_node_sil]
            eascr = escore - out_entv[exit_node_sil]
            trans = exg + M
            ent_src = jnp.argmax(trans, axis=0)
            entry = jnp.max(trans, axis=0)
            cur0 = newS[en_j, 0]
            e_here = entry[ea_j]
            ewin = e_here > cur0
            newS = newS.at[en_j, 0].set(jnp.where(ewin, e_here, cur0))
            newSTF = newSTF.at[en_j, 0].set(
                jnp.where(ewin, t + 1, newSTF[en_j, 0]))
            newPRA = newPRA.at[en_j, 0].set(
                jnp.where(ewin, ent_src[ea_j], newPRA[en_j, 0]))
            newENTV = newENTV.at[en_j, 0].set(
                jnp.where(ewin, e_here, newENTV[en_j, 0]))
            m = jnp.max(newS)
            newS = newS - m
            newENTV = newENTV - m
            final_score = jnp.max(escore + final_reach)
            return (newS, newSTF, newPRA, newENTV), (escore, estf, epra,
                                                     eascr, final_score)

        S0 = np.full((self.P, NST), NEG_INF, np.float32)
        STF0 = np.zeros((self.P, NST), np.int32)
        PRA0 = np.full((self.P, NST), -1, np.int32)
        ENTV0 = np.zeros((self.P, NST), np.float32)
        for k, node in enumerate(entry_nodes):
            a = entry_arcs[k]
            if np.isfinite(self.start_entry[a]):
                S0[node, 0] = self.start_entry[a]
        _, recs = jax.lax.scan(step, (jnp.asarray(S0), jnp.asarray(STF0),
                                      jnp.asarray(PRA0), jnp.asarray(ENTV0)),
                               (sen, jnp.arange(T, dtype=jnp.int32)))
        self.records = tuple(np.asarray(r) for r in recs)
        return self._backtrace(self.records, T)

    def _backtrace(self, recs, T):
        escore, estf, epra = [np.asarray(r) for r in recs[:3]]
        # best arc whose exit reaches the final state at the last frame
        reach = escore[T - 1] + self.final_reach
        a = int(np.argmax(reach))
        if not np.isfinite(reach[a]) or reach[a] < NEG_INF / 2:
            a = int(np.argmax(escore[T - 1]))
        segs = []
        t = T - 1
        while t >= 0 and a >= 0:
            wid = self.arcs[a][1]
            s = int(estf[t, a])
            segs.append(Seg(word=self.dict.wordstr(wid), start=s, end=t))
            p = int(epra[t, a])
            if s <= 0 or p < 0:
                break
            a = p
            t = s - 1
        segs.reverse()
        out = []
        for s in segs:
            wid = self.dict.wordid(s.word)
            if wid < 0 or self.dict.is_filler(wid):
                continue
            out.append(self.dict.basestr(wid))
        return " ".join(out), segs
