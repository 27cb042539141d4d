"""Regenerate tests/golden/wer20k/ref.json: the reference binary's
hypotheses + WER on the >=1000-word evaluation corpus
(pocketsphinx_tpu/evalcorpus.py) under the committed bench-20k task.

Usage: python tools/make_wer20k_golden.py [ref_build_dir]
Requires the reference built with cmake (tools/make_golden.sh header).
"""

import json
import os
import struct
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pocketsphinx_tpu.evalcorpus import build_corpus
from pocketsphinx_tpu.wer import wer, align_words

REF = os.environ.get("PS_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = (sys.argv[1] if len(sys.argv) > 1
           else os.environ.get("PS_REF_BUILD", "/tmp/ref-build")
           ) + "/pocketsphinx"


def write_wav(path, pcm):
    with open(path, "wb") as f:
        data = pcm.astype("<i2").tobytes()
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                      32000, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


from pocketsphinx_tpu.evalcorpus import TARGET_WORDS

corpus = build_corpus(REF, min_words=TARGET_WORDS)
print(f"corpus: {len(corpus)} utts, "
      f"{sum(len(w) for _, _, w in corpus)} ref words, "
      f"{sum(len(p) for _, p, _ in corpus) / 16000.0:.1f} audio-s")

tmpdir = tempfile.mkdtemp(prefix="wer20k-")


def decode_one(entry):
    name, pcm, ref_words = entry
    audio = os.path.join(tmpdir, name + ".wav")
    write_wav(audio, pcm)
    out = subprocess.run(
        [REF_BIN, "-hmm", REF + "/model/en-us/en-us",
         "-lm", HERE + "/bench_data/bench-20k.lm.bin",
         "-dict", HERE + "/bench_data/bench-20k.dic",
         "single", audio],
        capture_output=True, text=True, check=True).stdout
    os.unlink(audio)
    return name, ref_words, json.loads(out)["t"].split()


from concurrent.futures import ThreadPoolExecutor

results = {}
refs, hyps = [], []
nproc = max(os.cpu_count() or 1, 1)
with ThreadPoolExecutor(max_workers=nproc) as ex:
    for name, ref_words, hyp in ex.map(decode_one, corpus):
        c, s, i, d, _ = align_words(ref_words, hyp)
        results[name] = dict(hyp=" ".join(hyp), ref=" ".join(ref_words),
                             n_ref=len(ref_words), n_corr=c, n_sub=s,
                             n_ins=i, n_del=d)
        refs.append(ref_words)
        hyps.append(hyp)
        print(f"{name}: WER {(s + i + d) / max(len(ref_words), 1):.3f} "
              f"({s}s {i}i {d}d / {len(ref_words)})", flush=True)
agg = wer(refs, hyps)
results["_aggregate"] = agg
print("reference aggregate WER:", round(agg["wer"], 4))
with open(HERE + "/tests/golden/wer20k/ref.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote tests/golden/wer20k/ref.json")
