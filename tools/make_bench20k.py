"""Build the committed 20k-word benchmark task (VERDICT r2 next #2/#3):

  bench_data/bench-20k.dic      -- 20k cmudict words (+ librivox words)
  bench_data/bench-20k.lm.bin   -- trigram LM over that vocabulary whose
                                   bigram count forces the decoder's
                                   scalable "mode B" LM path
  tests/golden/wer20k/ref.json  -- the reference binary's hypotheses and
                                   WER on the librivox clips + goforward
                                   under this exact task (the
                                   "equal WER to pocketsphinx_batch"
                                   parity oracle, BASELINE.json)

Deterministic (seed 7).  Rerun after changing LM/dict formats."""

import glob
import io
import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pocketsphinx_tpu.lm.arpabo import ArpaBoLM
from pocketsphinx_tpu.lm.ngram import read_arpa, write_trie_bin
from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.wer import wer, align_words

REF = os.environ.get("PS_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.environ.get("PS_REF_BIN", "/root/ref-build/pocketsphinx")

am = AcousticModel.load(REF + "/model/en-us/en-us")
full = Dictionary(am.mdef, REF + "/model/en-us/cmudict-en-us.dict",
                  REF + "/model/en-us/en-us/noisedict")

livox = sorted(glob.glob(REF + "/test/data/librivox/*.txt"))
transcripts = {os.path.basename(p)[:-4]: open(p).read().split()
               for p in livox}
needed = sorted({w for ws in transcripts.values() for w in ws}
                | {"go", "forward", "ten", "meters"})
missing = [w for w in needed if full.wordid(w) < 0]
assert not missing, f"not in cmudict: {missing}"

rng = random.Random(7)
pool = [w for w in full._index
        if w.isalpha() and full.wordid(w) >= 0]
vocab = sorted(set(rng.sample(pool, 20000)) | set(needed))
print(f"vocab: {len(vocab)} words")

sents = []
for ws in transcripts.values():
    sents += [" ".join(ws)] * 25
sents += ["go forward ten meters"] * 25
for _ in range(120000):
    sents.append(" ".join(rng.sample(vocab, rng.randint(3, 8))))
print("building ARPA ...")
buf = io.StringIO()
ArpaBoLM(text="\n".join(sents), add_start=True).write(buf)
open("/tmp/bench20k.arpa", "w").write(buf.getvalue())
lm = read_arpa("/tmp/bench20k.arpa")
print("counts:", lm.counts)
print("writing trie binary ...")
write_trie_bin(lm, HERE + "/bench_data/bench-20k.lm.bin")
with open(HERE + "/bench_data/bench-20k.dic", "w") as f:
    for w in vocab:
        wid = full.wordid(w)
        phones = " ".join(am.mdef.ciname[p] for p in full.pron(wid))
        f.write(f"{w} {phones}\n")
print("wrote bench_data/bench-20k.{lm.bin,dic}")

# ---- reference-binary oracle: decode the corpus with this task ----
os.makedirs(HERE + "/tests/golden/wer20k", exist_ok=True)
results = {}
refs, hyps = [], []
clips = [(os.path.basename(p)[:-4],
          p[:-4] + ".wav", transcripts[os.path.basename(p)[:-4]])
         for p in livox]
clips.append(("goforward", REF + "/test/data/goforward.raw",
              "go forward ten meters".split()))
for name, audio, ref_words in clips:
    out = subprocess.run(
        [REF_BIN, "-hmm", REF + "/model/en-us/en-us",
         "-lm", HERE + "/bench_data/bench-20k.lm.bin",
         "-dict", HERE + "/bench_data/bench-20k.dic",
         "single", audio],
        capture_output=True, text=True, check=True).stdout
    hyp = json.loads(out)["t"].split()
    c, s, i, d, _ = align_words(ref_words, hyp)
    results[name] = dict(hyp=" ".join(hyp), ref=" ".join(ref_words),
                         n_ref=len(ref_words), n_corr=c, n_sub=s,
                         n_ins=i, n_del=d)
    refs.append(ref_words)
    hyps.append(hyp)
    print(f"{name}: WER {(s + i + d) / max(len(ref_words), 1):.3f} "
          f"({s}s {i}i {d}d / {len(ref_words)})")
agg = wer(refs, hyps)
results["_aggregate"] = agg
print("reference aggregate WER:", round(agg["wer"], 4))
with open(HERE + "/tests/golden/wer20k/ref.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote tests/golden/wer20k/ref.json")
