"""Benchmark: batched decode-pipeline throughput + corpus WER on one
TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Configurations of the full pipeline (PCM -> MFCC -> features -> dense
PTM senone scoring -> exact-trigram fused Viterbi scan):

  * large (headline): 1.7k-word vocabulary with the committed
    bench_data/bench-1.7k LM;
  * turtle: round 1's 91-word config, kept as a non-regression check;
  * wer20k: the 20k-word cmudict task (bench_data/bench-20k, scalable
    "mode B" LM path) decoding the librivox clips + goforward and
    scoring corpus WER against the transcripts.  The committed
    tests/golden/wer20k/ref.json holds the reference binary's WER on
    the SAME task (the "equal WER to pocketsphinx_batch" contract,
    BASELINE.json).  Skipped when BENCH_SKIP_20K=1.

Also reports the per-stage share (frontend / scoring / scan) for the
large config, measured by timing nested jit prefixes.

vs_baseline is the fraction of the north-star target (>=100x aggregate
real-time on a v5e-16, i.e. 100 audio-s/s as a 16-chip aggregate;
BASELINE.json) delivered by this single chip on the headline config.
"""

import json
import os
import time

import numpy as np


def build(ref, dic, lmfile, lw=6.5, wip=0.65):
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder

    model_dir = os.path.join(ref, "model/en-us/en-us")
    am = AcousticModel.load(model_dir)
    d = Dictionary(am.mdef, dic, os.path.join(model_dir, "noisedict"))
    d2p = Dict2Pid(am.mdef, d)
    lm = read_lm(lmfile, lw=lw, wip=wip)
    return NgramFusedDecoder(am, d2p, lm)


def bench_config(dec, fe, pcm, B, n_iter, measure_stages=False):
    import jax
    import jax.numpy as jnp
    from pocketsphinx_tpu.models.acoustic import senone_scores_jax
    from pocketsphinx_tpu.frontend.feat import compute_feats_jax

    batch = np.tile(pcm[None, :], (B, 1)).astype(np.float32)
    audio_seconds = B * len(pcm) / 16000.0
    arrays = dec.am.scoring_arrays
    groups = dec.am.cb_groups
    scan = dec._make_scan()

    @jax.jit
    def stage_fe(pcm_batch):
        cep, nfr = fe.process_batch_jax(pcm_batch)
        return compute_feats_jax(cep, nfr, cmn="batch"), nfr

    @jax.jit
    def stage_score(pcm_batch):
        feats, nfr = stage_fe(pcm_batch)
        return senone_scores_jax(arrays, groups, feats,
                                 time_chunk=16), nfr

    @jax.jit
    def pipeline(pcm_batch):
        costs, nfr = stage_score(pcm_batch)
        T = costs.shape[1]
        valid = jnp.arange(T)[None, :] < nfr[:, None]
        recs = jax.vmap(scan)(costs, valid)
        return recs[0]

    def timeit(fn, arg):
        out = fn(arg)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        t0 = time.time()
        for _ in range(n_iter):
            out = fn(arg)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        return (time.time() - t0) / n_iter

    dt = timeit(pipeline, batch)
    res = {"throughput": audio_seconds / dt, "sec_per_batch": dt,
           "batch": B}
    if measure_stages:
        t_fe = timeit(stage_fe, batch)
        t_sc = timeit(stage_score, batch)
        res["stage_share"] = {
            "frontend": round(t_fe / dt, 3),
            "scoring": round(max(t_sc - t_fe, 0.0) / dt, 3),
            "scan": round(max(dt - t_sc, 0.0) / dt, 3),
        }
    # correctness spot check through the batched decode path
    feats = np.asarray(stage_fe(batch[:1])[0][0])
    out = dec.decode_batch(feats[None], np.array([fe.n_frames(len(pcm))]))
    res["hyp"] = out[0][0]
    return res


def bench_wer20k(ref, here, fe):
    """Decode the librivox corpus + goforward with the 20k-word task;
    return WER + throughput + the reference binary's WER on the same
    task (from the committed golden)."""
    import glob
    import json as _json
    import time
    import numpy as np
    from pocketsphinx_tpu.frontend.feat import compute_feats
    from pocketsphinx_tpu.fileio.sound import read_audio
    from pocketsphinx_tpu.wer import wer

    dec = build(ref, os.path.join(here, "bench_data/bench-20k.dic"),
                os.path.join(here, "bench_data/bench-20k.lm.bin"))
    clips = []
    for p in sorted(glob.glob(ref + "/test/data/librivox/*.wav")):
        pcm, sr = read_audio(p)
        assert sr == 16000
        txt = open(p[:-4] + ".txt").read().split()
        clips.append((pcm, txt))
    pcm = np.frombuffer(open(ref + "/test/data/goforward.raw",
                             "rb").read(), dtype="<i2")
    clips.append((pcm, "go forward ten meters".split()))
    per_utt = [compute_feats(fe.process(p), cmn="batch")
               for p, _ in clips]
    nfr = [len(f) for f in per_utt]
    feats = np.zeros((len(clips), max(nfr)) + per_utt[0].shape[1:],
                     np.float32)
    for i, f in enumerate(per_utt):
        feats[i, :len(f)] = f
    # warm-up decode compiles the scan for this shape; time steady state
    out = dec.decode_batch(feats, np.array(nfr))
    t0 = time.time()
    out = dec.decode_batch(feats, np.array(nfr))
    dt = time.time() - t0
    audio_s = sum(len(p) for p, _ in clips) / 16000.0
    refs = [t for _, t in clips]
    hyps = [h.split() for h, _ in out]
    ours = wer(refs, hyps)
    golden = os.path.join(here, "tests/golden/wer20k/ref.json")
    ref_wer = None
    if os.path.exists(golden):
        ref_wer = _json.load(open(golden))["_aggregate"]["wer"]
    return {
        "W": dec.W, "lm_mode": dec.lm_mode,
        "lm_order_used": dec.lm_order_used,
        "wer": round(ours["wer"], 4),
        "ref_binary_wer": (round(ref_wer, 4)
                           if ref_wer is not None else None),
        "n_ref_words": ours["n_ref"],
        "throughput": round(audio_s / dt, 2),
        "audio_s": round(audio_s, 1),
    }


def main():
    ref = os.environ.get("PS_REFERENCE", "/root/reference")
    here = os.path.dirname(os.path.abspath(__file__))
    model_dir = os.path.join(ref, "model/en-us/en-us")
    raw = os.path.join(ref, "test/data/goforward.raw")
    if not os.path.isdir(model_dir):
        print(json.dumps({"metric": "audio_s_per_s_per_chip", "value": 0.0,
                          "unit": "audio-seconds/s",
                          "vs_baseline": 0.0, "error": "model missing"}))
        return

    from pocketsphinx_tpu.frontend.mfcc import MelFrontend

    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer(open(raw, "rb").read(), dtype="<i2")
    n_iter = int(os.environ.get("BENCH_ITERS", "5"))

    # headline: 1.7k-word vocabulary
    dec_big = build(ref, os.path.join(here, "bench_data/bench-1.7k.dic"),
                    os.path.join(here, "bench_data/bench-1.7k.lm.bin"))
    big = bench_config(dec_big, fe, pcm,
                       B=int(os.environ.get("BENCH_BATCH_BIG", "48")),
                       n_iter=n_iter, measure_stages=True)
    big["W"] = dec_big.W
    big["P"] = dec_big.P

    # non-regression: turtle 91-word config
    dec_sm = build(ref, os.path.join(ref, "test/data/turtle.dic"),
                   os.path.join(ref, "test/data/turtle.lm.bin"))
    small = bench_config(dec_sm, fe, pcm,
                         B=int(os.environ.get("BENCH_BATCH", "512")),
                         n_iter=n_iter)
    small["W"] = dec_sm.W

    wer20k = None
    if not os.environ.get("BENCH_SKIP_20K"):
        try:
            wer20k = bench_wer20k(ref, here, fe)
        except Exception as e:
            wer20k = {"error": repr(e)[:200]}

    value = big["throughput"]
    print(json.dumps({
        "metric": "audio_s_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-seconds/s",
        "vs_baseline": round(value / 100.0, 3),
        "detail": {
            "headline": "1.7k-word exact-trigram decode",
            "large": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in big.items()},
            "turtle": {k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in small.items()},
            "wer20k": wer20k,
        },
    }))


if __name__ == "__main__":
    main()
