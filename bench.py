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

    from pocketsphinx_tpu.models.acoustic import AcousticModel, senone_scores_jax
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats_jax

    am = AcousticModel.load(model_dir)
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer(open(raw, "rb").read(), dtype="<i2")
    B = int(os.environ.get("BENCH_BATCH", "16"))
    batch = np.tile(pcm[None, :], (B, 1)).astype(np.float32)
    audio_seconds = B * len(pcm) / 16000.0

    arrays = am.scoring_arrays
    groups = am.cb_groups

    @jax.jit
    def pipeline(pcm_batch):
        cep, nfr = fe.process_batch_jax(pcm_batch)
        feats = compute_feats_jax(cep, nfr, cmn="batch")
        costs = senone_scores_jax(arrays, groups, feats)
        return costs

    # compile + warm up
    out = pipeline(batch)
    out.block_until_ready()
    # timed runs
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
                   "stage": "frontend+feat+senone-scoring"},
    }))


if __name__ == "__main__":
    main()
