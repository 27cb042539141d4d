"""Benchmark: batched decode-pipeline throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full currently-implemented decode pipeline — PCM -> MFCC
frontend -> dynamic features -> dense PTM senone scoring (the reference's
hot kernel #1, src/ptm_mgau.c:409) — on the bundled en-us model over a
batch of real audio, reporting audio-seconds processed per wall second on
one chip.  vs_baseline is the fraction of the north-star target
(>=100x aggregate real-time on a v5e-16, BASELINE.json) delivered by
this single chip.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    ref = os.environ.get("PS_REFERENCE", "/root/reference")
    model_dir = os.path.join(ref, "model/en-us/en-us")
    raw = os.path.join(ref, "test/data/goforward.raw")
    if not os.path.isdir(model_dir):
        print(json.dumps({"metric": "audio_s_per_s_per_chip", "value": 0.0,
                          "unit": "audio-seconds/s",
                          "vs_baseline": 0.0, "error": "model missing"}))
        return

    import jax.numpy as jnp
    from pocketsphinx_tpu.models.acoustic import AcousticModel, senone_scores_jax
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats_jax
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder

    am = AcousticModel.load(model_dir)
    d = Dictionary(am.mdef, os.path.join(ref, "test/data/turtle.dic"),
                   os.path.join(model_dir, "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(os.path.join(ref, "test/data/turtle.lm.bin"),
                 lw=6.5, wip=0.65)
    dec = NgramFlatDecoder(am, d2p, lm)
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer(open(raw, "rb").read(), dtype="<i2")
    B = int(os.environ.get("BENCH_BATCH", "256"))
    batch = np.tile(pcm[None, :], (B, 1)).astype(np.float32)
    audio_seconds = B * len(pcm) / 16000.0

    arrays = am.scoring_arrays
    groups = am.cb_groups
    scan = dec._make_scan()

    @jax.jit
    def pipeline(pcm_batch):
        """Full decode: PCM -> MFCC -> features -> senone scores ->
        n-gram Viterbi scan records (host backtrace excluded; it is
        microseconds per utterance)."""
        cep, nfr = fe.process_batch_jax(pcm_batch)
        feats = compute_feats_jax(cep, nfr, cmn="batch")
        costs = senone_scores_jax(arrays, groups, feats, time_chunk=16)
        T = costs.shape[1]
        valid = jnp.arange(T)[None, :] < nfr[:, None]
        recs = jax.vmap(scan)(costs, valid)
        return recs[0]

    out = pipeline(batch)
    out.block_until_ready()
    # correctness spot check through the same batched path
    res = dec.decode_batch(
        compute_feats_jax(*fe.process_batch_jax(batch[:1]), cmn="batch"),
        np.array([fe.n_frames(len(pcm))]))
    hyp = res[0][0]
    n_iter = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.time()
    for _ in range(n_iter):
        out = pipeline(batch)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iter
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "audio_s_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-seconds/s",
        "vs_baseline": round(value / 100.0, 3),
        "detail": {"batch": B, "sec_per_batch": round(dt, 4),
                   "stage": "full decode (frontend+scoring+ngram-viterbi)",
                   "hyp": hyp},
    }))


if __name__ == "__main__":
    main()
