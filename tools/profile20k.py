"""Profile the 20k-word decode through the production decode_batch
path: senone scoring vs Viterbi scan vs device backtrace vs (optional)
record transfer.  Run on the real TPU (one process only).

Usage: python tools/profile20k.py [--config 20k|1.7k] [--iters N]
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="20k")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--xfer", action="store_true",
                    help="also time one utterance's record transfer")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats
    from pocketsphinx_tpu.fileio.sound import read_audio
    from pocketsphinx_tpu.models.acoustic import senone_scores_jax

    ref = os.environ.get("PS_REFERENCE", "/root/reference")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)

    t0 = time.time()
    dec = build(ref, os.path.join(here, f"bench_data/bench-{args.config}.dic"),
                os.path.join(here, f"bench_data/bench-{args.config}.lm.bin"))
    scan = dec._make_scan()          # builds LM tables too
    print(f"build+tables: {time.time()-t0:.1f}s W={dec.W} "
          f"mode={dec.lm_mode} P={dec.P}", flush=True)
    if dec.lm_mode == "sparse":
        sp = dec._lm_sparse
        print(f"  n_bg={sp['n_bg']} S_max={sp['S_max']} "
              f"bg_bytes={sp['bg'].nbytes/1e6:.0f}MB "
              f"tg_cols={len(sp['tg_cols'])}", flush=True)

    clips = []
    for p in sorted(glob.glob(ref + "/test/data/librivox/*.wav")):
        pcm, sr = read_audio(p)
        clips.append(pcm)
    pcm = np.frombuffer(open(ref + "/test/data/goforward.raw", "rb").read(),
                        dtype="<i2")
    clips.append(pcm)
    per_utt = [compute_feats(fe.process(p), cmn="batch") for p in clips]
    nfr = [len(f) for f in per_utt]
    feats = np.zeros((len(clips), max(nfr)) + per_utt[0].shape[1:], np.float32)
    for i, f in enumerate(per_utt):
        feats[i, :len(f)] = f
    audio_s = sum(len(p) for p in clips) / 16000.0
    print(f"B={len(clips)} T={max(nfr)} audio_s={audio_s:.1f}", flush=True)

    feats_j = jnp.asarray(feats)
    n_frames = jnp.asarray(np.array(nfr))
    B, T = feats.shape[:2]

    def sync(x):
        jax.tree.map(lambda a: a.block_until_ready(), x)

    t0 = time.time()
    out = dec.decode_batch(feats_j, n_frames)
    print(f"compile+first decode_batch: {time.time()-t0:.1f}s "
          f"hyp[-1]={out[-1][0]!r}", flush=True)
    dec.batch_records = None      # release pinned device records

    for it in range(args.iters):
        t0 = time.time()
        out = dec.decode_batch(feats_j, n_frames)
        dt = time.time() - t0
        dec.batch_records = None
        print(f"decode_batch steady {it}: {dt:.2f}s -> "
              f"{audio_s/dt:.2f} audio-s/s", flush=True)

    valid = jnp.arange(T)[None, :] < n_frames[:, None]
    for it in range(args.iters):
        t0 = time.time()
        costs = senone_scores_jax(dec.am.scoring_arrays,
                                  dec.am.cb_groups, feats_j)
        sync(costs)
        t_sc = time.time() - t0

        t0 = time.time()
        raw = jax.vmap(scan)(costs, valid)
        sync(raw)
        t_scan = time.time() - t0

        t0 = time.time()
        tb, ns, _ = jax.vmap(dec._make_backtrace_jax())(
            raw[0], raw[1], raw[2], raw[5],
            n_frames.astype(jnp.int32))
        sync((tb, ns))
        t_bt = time.time() - t0

        tot = t_sc + t_scan + t_bt
        print(f"iter{it}: score={t_sc:.2f}s scan={t_scan:.2f}s "
              f"bt={t_bt:.2f}s total={tot:.2f}s "
              f"-> {audio_s/tot:.2f} audio-s/s "
              f"({1000*t_scan/T:.2f} ms/step scan)", flush=True)
        if args.xfer and it == args.iters - 1:
            t0 = time.time()
            raw0 = tuple(np.asarray(r[0]) for r in raw)
            t_x = time.time() - t0
            t0 = time.time()
            dec.adapt_records(raw0, int(nfr[0]))
            t_a = time.time() - t0
            nbytes = sum(r.nbytes for r in raw0)
            print(f"  xfer 1 utt ({nbytes/1e6:.0f} MB): {t_x:.2f}s, "
                  f"adapt: {t_a:.2f}s", flush=True)
        del raw, tb, ns, costs


if __name__ == "__main__":
    main()
