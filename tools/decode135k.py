"""Decode goforward under the 135k-word full-cmudict task (the
reference's actual operating scale: cmudict-en-us.dict + a trigram LM
big enough that only the fully-sparse "mode C" LM path fits one chip).

Prints ONE JSON line with the hypothesis, LM mode/order, build/compile
/decode timings, and agreement with the committed reference-binary
golden (tests/golden/wer135k/ref.json).  Run standalone or from
bench.py (subprocess with a timeout).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ref = os.environ.get("PS_REFERENCE", "/root/reference")
    from bench import build
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats

    t0 = time.time()
    dec = build(ref, os.path.join(ref, "model/en-us/cmudict-en-us.dict"),
                os.path.join(HERE, "bench_data/bench-135k.lm.bin"))
    t_build = time.time() - t0

    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    pcm = np.frombuffer(
        open(ref + "/test/data/goforward.raw", "rb").read(), dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    audio_s = len(pcm) / 16000.0

    # decoding is embarrassingly parallel across utterances: measure
    # the per-chip THROUGHPUT at a small batch (HBM at 135k words
    # allows B=3: CSR LM tables + [3, n_rc, W] fan carry per utt)
    B = int(os.environ.get("PS_135K_BATCH", "3"))
    while True:
        fb = np.tile(feats[None], (B, 1, 1, 1)).astype(np.float32)
        nf = np.full(B, len(feats), np.int32)
        t0 = time.time()
        try:
            out = dec.decode_batch(fb, nf, keep_records=False)
            t_first = time.time() - t0
            break
        except Exception as e:            # HBM OOM at this batch
            if B == 1:
                raise
            sys.stderr.write(f"B={B} failed ({e!r:.120}), retrying "
                             f"with B=1\n")
            B = 1
    t0 = time.time()
    out = dec.decode_batch(fb, nf, keep_records=False)
    t_decode = time.time() - t0
    hyp, segs = out[0]
    audio_s = audio_s * B

    golden = os.path.join(HERE, "tests/golden/wer135k/ref.json")
    ref_hyp = None
    if os.path.exists(golden):
        ref_hyp = json.load(open(golden))["goforward"]["hyp"]
    print(json.dumps({
        "W": dec.W, "lm_mode": dec.lm_mode,
        "lm_order_used": dec.lm_order_used,
        "hyp": hyp, "ref_binary_hyp": ref_hyp,
        "correct": hyp == "go forward ten meters",
        "guard_unproven": int(dec.guard_violations),
        "batch": B,
        "build_s": round(t_build, 1),
        "compile_s": round(t_first - t_decode, 1),
        "throughput": round(audio_s / t_decode, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
