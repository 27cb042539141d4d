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
        mdef, d = self.mdef, self.dict
        # background: all CI phones
        nci = mdef.n_ciphone
        self.bg_senid = mdef.sseq[mdef.phone_ssid[:nci]].astype(np.int32)
        tpc = self.am.tmat.tp[mdef.phone_tmat[:nci]].astype(np.float32)
        self.bg_tp = np.where(tpc == 255, NEG_INF, -tpc)
        # keyphrases: concatenated word pronunciations (CI phones)
        self.kw_phones = []
        usable = []
        for phrase, thresh in self.keyphrases:
            phones = []
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
                phones.extend(int(p) for p in d.pron(wid))
            if ok and phones:
                usable.append((phrase, thresh))
                self.kw_phones.append(phones)
        if not usable:
            raise ValueError("no usable keyphrases")
        self.keyphrases = usable
        self.thresholds = [math.log(t) / UNIT_NATS
                           for _, t in usable]
        K = max(len(p) for p in self.kw_phones)
        NK = len(self.kw_phones)
        self.kw_len = np.array([len(p) for p in self.kw_phones])
        nst = mdef.n_emit_state
        senid = np.zeros((NK, K, nst), np.int32)
        tp = np.full((NK, K, nst, nst + 1), NEG_INF, np.float32)
        for i, phones in enumerate(self.kw_phones):
            for j, ci in enumerate(phones):
                senid[i, j] = mdef.sseq[mdef.phone_ssid[ci]]
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
            # background loop: re-enter all phones from the best exit
            enter = bg_best + self.log_plp
            Sbg = Sbg.at[:, 0].set(jnp.maximum(Sbg[:, 0], enter))
            # keyphrase chains
            Skw, _, kw_out, _ = hmm_step(Skw, kw_sen, kw_tp)
            # chain transitions j-1 -> j
            ent = jnp.pad(kw_out[:, :-1], ((0, 0), (1, 0)),
                          constant_values=NEG_INF)
            win = ent > Skw[:, :, 0]
            Skw = Skw.at[:, :, 0].set(jnp.where(win, ent, Skw[:, :, 0]))
            newSTF = jnp.where(win, jnp.pad(STF[:, :-1], ((0, 0), (1, 0))),
                               STF)
            # keyphrase start: enter first phone from background
            st_win = enter > Skw[:, 0, 0]
            Skw = Skw.at[:, 0, 0].set(
                jnp.where(st_win, enter, Skw[:, 0, 0]))
            newSTF = newSTF.at[:, 0].set(
                jnp.where(st_win, t + 1, newSTF[:, 0]))
            # detection score: keyphrase exit vs background best
            kw_exit = jnp.take_along_axis(
                kw_out, (kw_len - 1)[:, None], axis=1)[:, 0]
            kw_stf = jnp.take_along_axis(
                newSTF, (kw_len - 1)[:, None], axis=1)[:, 0]
            valid = (kw_exit > NEG_INF / 2) & (bg_best > NEG_INF / 2)
            ratio = jnp.where(valid, kw_exit - bg_best, NEG_INF)
            # renormalize
            m = jnp.maximum(jnp.max(Sbg), jnp.max(Skw))
            Sbg = Sbg - m
            Skw = Skw - m
            return (Sbg, Skw, newSTF), (ratio, kw_stf)

        Sbg0 = np.full((nci, NST), NEG_INF, np.float32)
        Sbg0[:, 0] = 0.0
        Skw0 = np.full((NK, K, NST), NEG_INF, np.float32)
        STF0 = np.zeros((NK, K), np.int32)
        _, (ratios, stfs) = jax.lax.scan(
            step, (jnp.asarray(Sbg0), jnp.asarray(Skw0), jnp.asarray(STF0)),
            (bg_sen_all, kw_sen_all, jnp.arange(T, dtype=jnp.int32)))
        ratios = np.asarray(ratios)      # [T, NK]
        stfs = np.asarray(stfs)
        # detection extraction with kws_delay: greedy local maxima above
        # threshold, non-overlapping per keyphrase
        dets: list[Detection] = []
        for i, (phrase, _) in enumerate(self.keyphrases):
            thr = self.thresholds[i]
            r = ratios[:, i]
            t = 0
            while t < T:
                if r[t] >= thr:
                    end = min(t + self.delay, T - 1)
                    span = r[t:end + 1]
                    best = t + int(np.argmax(span))
                    dets.append(Detection(
                        keyphrase=phrase, start=int(stfs[best, i]),
                        end=best, score=float(r[best])))
                    t = best + 1
                    # skip until ratio drops below threshold
                    while t < T and r[t] >= thr:
                        t += 1
                else:
                    t += 1
        # merge overlapping detections of the same phrase (one keyword
        # instance can keep its ratio above threshold across re-triggers)
        dets.sort(key=lambda d: (d.keyphrase, d.start))
        merged: list[Detection] = []
        for det in dets:
            if (merged and merged[-1].keyphrase == det.keyphrase
                    and det.start <= merged[-1].end):
                if det.score > merged[-1].score:
                    merged[-1] = Detection(det.keyphrase,
                                           merged[-1].start, det.end,
                                           det.score)
                else:
                    merged[-1].end = max(merged[-1].end, det.end)
                continue
            merged.append(det)
        merged.sort(key=lambda d: d.start)
        return merged
