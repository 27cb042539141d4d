"""Pipeline parallelism (PP): stage the decode across devices.

SURVEY §2.3 PP row: "stage pipeline frontend→scoring→search across
devices for streaming; low priority — implement as an optional
pipeline for the batch path".  The reference has no analog (it is a
single-threaded library); this is TPU-native scale-out surface.

Two stages, the natural cut for this workload:

  stage 0 (device A): PCM → MFCC → features → dense senone scoring
                      (MXU-heavy, stateless per frame)
  stage 1 (device B): the fused Viterbi scan (sequential in T) +
                      host backtrace

Micro-batches flow A→B; JAX's async dispatch overlaps stage 0 of
micro-batch i+1 with stage 1 of micro-batch i, and the costs tensor
hops devices with an explicit device_put (ICI on real hardware).
Throughput gain is bounded by the slower stage; the win is freeing
stage-0 FLOPs to a chip that would otherwise idle while the scan's
recurrence runs.  Hypotheses are bit-identical to single-device
decoding (the stages are the same jitted functions).
"""

from __future__ import annotations

import numpy as np


class TwoStagePipeline:
    """Frontend+scoring on one device, Viterbi scan on another."""

    def __init__(self, decoder_search, frontend, dev_score=None,
                 dev_scan=None, cmn: str = "batch"):
        import jax
        devs = jax.devices()
        self.search = decoder_search
        self.fe = frontend
        self.dev_score = dev_score or devs[0]
        self.dev_scan = dev_scan or devs[min(1, len(devs) - 1)]
        self.cmn = cmn
        self._build()

    def _build(self):
        import jax
        import jax.numpy as jnp
        from ..models.acoustic import senone_scores_jax
        from ..frontend.feat import compute_feats_jax

        fe = self.fe
        arrays = self.search.am.scoring_arrays
        groups = self.search.am.cb_groups
        scan = self.search._make_scan()

        def stage_score(pcm_batch, n_samps):
            cep, nfr = fe.process_batch_jax(pcm_batch, n_samps)
            feats = compute_feats_jax(cep, nfr, cmn=self.cmn)
            return senone_scores_jax(arrays, groups, feats), nfr

        def stage_scan(costs, nfr, tables):
            # tables as arguments, not captured constants (compile-size
            # hazard at scale; see ngram_fused.with_tables)
            T = costs.shape[1]
            valid = jnp.arange(T)[None, :] < nfr[:, None]
            if hasattr(scan, "with_tables"):
                return jax.vmap(
                    lambda c, v: scan.with_tables(c, v, tables))(
                    costs, valid)
            return jax.vmap(scan)(costs, valid)

        # stage placement via input placement (jit device= is deprecated):
        # jit follows its argument devices
        score_jit = jax.jit(stage_score)
        scan_jit = jax.jit(stage_scan)
        tabs = getattr(self.search, "_dev_tables", None) or {}
        tabs_scan = {k: jax.device_put(v, self.dev_scan)
                     for k, v in tabs.items()}

        def run_score(pcm_batch, n_samps):
            return score_jit(jax.device_put(pcm_batch, self.dev_score),
                             jax.device_put(n_samps, self.dev_score))

        self._stage_score = run_score
        self._stage_scan = lambda costs, nfr: scan_jit(costs, nfr,
                                                       tabs_scan)

    def decode_corpus(self, pcm_list, micro_batch: int = 8):
        """Decode utterances in micro-batches pipelined across the two
        devices; returns [(hyp, segs)] in input order."""
        import jax

        order = sorted(range(len(pcm_list)), key=lambda i: len(pcm_list[i]))
        results = [None] * len(pcm_list)
        inflight = []   # (idx list, n_frames, scan-output future)

        def drain(entry):
            idx, nfr, recs = entry
            recs = tuple(np.asarray(r) for r in recs)
            nfr = np.asarray(nfr)
            for k, i in enumerate(idx):
                per_utt = tuple(r[k] for r in recs)
                results[i] = self.search._backtrace(per_utt, int(nfr[k]))

        for i0 in range(0, len(order), micro_batch):
            idx = order[i0:i0 + micro_batch]
            maxlen = max(len(pcm_list[i]) for i in idx)
            B = len(idx)
            batch = np.zeros((B, maxlen), np.float32)
            ns = np.zeros(B, np.int32)
            for k, i in enumerate(idx):
                batch[k, :len(pcm_list[i])] = pcm_list[i]
                ns[k] = len(pcm_list[i])
            costs, nfr = self._stage_score(batch, ns)
            # hop to the scan device (ICI transfer on hardware); async,
            # so stage 0 of the next micro-batch overlaps stage 1 of
            # this one
            costs = jax.device_put(costs, self.dev_scan)
            nfr_b = jax.device_put(nfr, self.dev_scan)
            recs = self._stage_scan(costs, nfr_b)
            inflight.append((idx, nfr, recs))
            if len(inflight) > 2:
                drain(inflight.pop(0))
        for entry in inflight:
            drain(entry)
        return results
