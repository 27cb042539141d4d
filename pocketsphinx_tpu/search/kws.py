"""Keyword spotting: keyphrase HMM chains vs. a CI phone-loop background
(src/kws_search.c re-design).

Each keyphrase is a linear phone chain; the background model is a loop
over all CI phones with loop probability kws_plp.  A detection fires when
the keyphrase's exit likelihood beats the background path over the same
span by the per-keyphrase threshold (p(keyphrase)/p(background) ratio,
src/kws_search.c:620-700), evaluated densely every frame in one scan.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..models.dict2pid import Dict2Pid
from ..models.acoustic import AcousticModel, UNIT_NATS
from .ngram_flat import Seg
from ..ops.hmm import hmm_step

NEG_INF = -1e30


def parse_kws_file(path: str, default_threshold: float):
    """Parse a -kws file: one keyphrase per line, optional /threshold/
    suffix; malformed lines are skipped with a warning like the
    reference (kws_search.c keyphrase file parsing)."""
    import sys
    out = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        if "/" in line:
            parts = line.split("/")
            try:
                thresh = float(parts[1])
            except (ValueError, IndexError):
                sys.stderr.write(f"WARNING: bad kws line {line!r}\n")
                continue
            out.append((parts[0].strip(), thresh))
        else:
            out.append((line, default_threshold))
    return out


@dataclass
class Detection:
    keyphrase: str
    start: int
    end: int
    score: float


class KwsDecoder:
    def __init__(self, am: AcousticModel, d2p: Dict2Pid,
                 keyphrases: list[tuple[str, float]],
                 plp: float = 0.1, delay: int = 10):
        self.am = am
        self.d2p = d2p
        self.dict = d2p.dict
        self.mdef = am.mdef
        self.delay = delay
        self.log_plp = math.log(plp) / UNIT_NATS
        self.keyphrases = keyphrases
        self.thresholds = [math.log(t) / UNIT_NATS / (1 << 0)
                           for _, t in keyphrases]
        self._build()

    def _build(self):
        mdef, d, d2p = self.mdef, self.dict, self.d2p
        sil = mdef.sil
        # background: all CI phones
        nci = mdef.n_ciphone
        self.bg_senid = mdef.sseq[mdef.phone_ssid[:nci]].astype(np.int32)
        tpc = self.am.tmat.tp[mdef.phone_tmat[:nci]].astype(np.float32)
        self.bg_tp = np.where(tpc == 255, NEG_INF, -tpc)
        # keyphrases: per-word triphone chains with SIL outer contexts,
        # exactly like kws_search_reinit (src/kws_search.c:80-107):
        # first phone ldiph_lc(ci, next, SIL), last phone rssid with
        # SIL right context, word-internal triphones in between
        self.kw_units = []      # [(ci, ssid)] per keyphrase
        usable = []
        for phrase, thresh in self.keyphrases:
            units = []
            ok = True
            for w in phrase.split():
                wid = d.wordid(w)
                if wid < 0:
                    import sys
                    sys.stderr.write(
                        f"WARNING: unknown word {w!r}; skipping "
                        f"keyphrase {phrase!r}\n")
                    ok = False
                    break
                pron = [int(p) for p in d.pron(wid)]
                L = len(pron)
                for p, ci in enumerate(pron):
                    if p == 0:
                        rc = pron[1] if L > 1 else sil
                        ssid = int(d2p.ldiph_lc[ci, rc, sil])
                    elif p == L - 1:
                        uniq, cimap = d2p.rssid(ci, pron[p - 1])
                        ssid = int(uniq[int(cimap[sil])])
                    else:
                        ssid = int(d2p.internal_ssids(wid)[p - 1])
                    units.append((ci, ssid))
            if ok and units:
                usable.append((phrase, thresh))
                self.kw_units.append(units)
        if not usable:
            raise ValueError("no usable keyphrases")
        self.keyphrases = usable
        self.thresholds = [math.log(t) / UNIT_NATS
                           for _, t in usable]
        K = max(len(u) for u in self.kw_units)
        NK = len(self.kw_units)
        self.kw_len = np.array([len(u) for u in self.kw_units])
        nst = mdef.n_emit_state
        senid = np.zeros((NK, K, nst), np.int32)
        tp = np.full((NK, K, nst, nst + 1), NEG_INF, np.float32)
        for i, units in enumerate(self.kw_units):
            for j, (ci, ssid) in enumerate(units):
                senid[i, j] = mdef.sseq[ssid]
                t = self.am.tmat.tp[mdef.phone_tmat[ci]].astype(np.float32)
                tp[i, j] = np.where(t == 255, NEG_INF, -t)
        self.kw_senid = senid
        self.kw_tp = tp

    def decode(self, feats: np.ndarray, costs: np.ndarray | None = None):
        """Returns (hyp string of detections, segs)."""
        dets = self.detect(feats, costs)
        segs = [Seg(word=d.keyphrase, start=d.start, end=d.end)
                for d in dets]
        return " ".join(d.keyphrase for d in dets), segs

    def detect(self, feats, costs=None) -> list[Detection]:
        import jax
        import jax.numpy as jnp
        from ..models.acoustic import senone_scores_jax

        if costs is None:
            costs = senone_scores_jax(
                self.am.scoring_arrays, self.am.cb_groups,
                np.asarray(feats)[None].astype(np.float32))[0]
        costs = jnp.asarray(costs)
        T = costs.shape[0]
        nci = self.bg_senid.shape[0]
        NK, K = self.kw_senid.shape[:2]

        NST = self.mdef.n_emit_state
        bg_sen_all = -costs[:, self.bg_senid.reshape(-1)].reshape(T, nci, NST)
        kw_sen_all = -costs[:, self.kw_senid.reshape(-1)].reshape(T, NK, K, NST)
        bg_tp = jnp.asarray(self.bg_tp)
        kw_tp = jnp.asarray(self.kw_tp)
        kw_len = jnp.asarray(self.kw_len)

        def step(carry, xs):
            Sbg, Skw, STF = carry
            bg_sen, kw_sen, t = xs
            Sbg, _, bg_out, _ = hmm_step(Sbg, bg_sen, bg_tp)
            bg_best = jnp.max(bg_out)
            # keyphrase chains
            Skw, kwsrc, kw_out, kw_osrc = hmm_step(Skw, kw_sen, kw_tp)
            # the detection fires BEFORE transitions, from this frame's
            # exit scores (kws_search_trans order,
            # src/kws_search.c:262-295): last hmm exit vs best phone-
            # loop exit, sf = the token's entry frame
            from ..ops.hmm import propagate_meta, out_meta
            STF = propagate_meta(STF, kwsrc)
            kw_exit = jnp.take_along_axis(
                kw_out, (kw_len - 1)[:, None], axis=1)[:, 0]
            exit_stf = out_meta(STF, kw_osrc)
            kw_stf = jnp.take_along_axis(
                exit_stf, (kw_len - 1)[:, None], axis=1)[:, 0]
            valid = (kw_exit > NEG_INF / 2) & (bg_best > NEG_INF / 2)
            ratio = jnp.where(valid, kw_exit - bg_best, NEG_INF)
            # background loop: re-enter all phones from the best exit
            # with the loop probability
            enter = bg_best + self.log_plp
            Sbg = Sbg.at[:, 0].set(jnp.maximum(Sbg[:, 0], enter))
            # chain transitions j-1 -> j (hmm_out(pred) vs hmm_in(next))
            ent = jnp.pad(kw_out[:, :-1], ((0, 0), (1, 0)),
                          constant_values=NEG_INF)
            ent_stf = jnp.pad(out_meta(STF, kw_osrc)[:, :-1],
                              ((0, 0), (1, 0)))
            win = ent > Skw[:, :, 0]
            Skw = Skw.at[:, :, 0].set(jnp.where(win, ent, Skw[:, :, 0]))
            STF = STF.at[:, :, 0].set(
                jnp.where(win, ent_stf, STF[:, :, 0]))
            # keyphrase start: enter first phone from the best phone-
            # loop exit with NO loop penalty, sf = current frame
            # (src/kws_search.c:318-322)
            st_win = bg_best > Skw[:, 0, 0]
            Skw = Skw.at[:, 0, 0].set(
                jnp.where(st_win, bg_best, Skw[:, 0, 0]))
            STF = STF.at[:, 0, 0].set(
                jnp.where(st_win, t, STF[:, 0, 0]))
            # renormalize
            m = jnp.maximum(jnp.max(Sbg), jnp.max(Skw))
            Sbg = Sbg - m
            Skw = Skw - m
            return (Sbg, Skw, STF), (ratio, kw_stf)

        Sbg0 = np.full((nci, NST), NEG_INF, np.float32)
        Sbg0[:, 0] = 0.0
        Skw0 = np.full((NK, K, NST), NEG_INF, np.float32)
        STF0 = np.zeros((NK, K, NST), np.int32)
        _, (ratios, stfs) = jax.lax.scan(
            step, (jnp.asarray(Sbg0), jnp.asarray(Skw0), jnp.asarray(STF0)),
            (bg_sen_all, kw_sen_all, jnp.arange(T, dtype=jnp.int32)))
        ratios = np.asarray(ratios)      # [T, NK]
        stfs = np.asarray(stfs)
        # detection accumulation: the exact kws_detections_add merge
        # (src/kws_detections.c:52-80 -- an overlapping same-keyphrase
        # detection is replaced when the new probability is better) with
        # prob = ratio - KWS_MAX (src/kws_search.c:59,290), then the
        # kws_delay hyp filter (detections still within `delay` frames
        # of the end are withheld, kws_detections_hyp_str)
        KWS_MAX = 1500.0
        dets: list[Detection] = []
        for t in range(T):
            for i, (phrase, _) in enumerate(self.keyphrases):
                if ratios[t, i] < self.thresholds[i] \
                        or ratios[t, i] <= NEG_INF / 2:
                    continue
                sf, ef = int(stfs[t, i]), t
                prob = float(ratios[t, i]) - KWS_MAX
                for d_ in dets:
                    if d_.keyphrase == phrase and d_.start < ef \
                            and d_.end > sf:
                        if d_.score < prob:
                            d_.start, d_.end, d_.score = sf, ef, prob
                        break
                else:
                    dets.append(Detection(keyphrase=phrase, start=sf,
                                          end=ef, score=prob))
        dets = [d_ for d_ in dets if d_.end <= T - self.delay]
        dets.sort(key=lambda d_: d_.start)
        return dets
