"""Build the committed 135k-word (full cmudict) benchmark task
(round-3 review next #2):

  bench_data/bench-135k.lm.bin   -- trigram LM over the ENTIRE
                                    cmudict-en-us vocabulary, large
                                    enough that only the fully-sparse
                                    "mode C" LM path can represent it
                                    on one chip (mode B's dense tables
                                    would be ~150 GB)
  tests/golden/wer135k/ref.json  -- the reference binary's goforward
                                    hypothesis under this exact task

The dictionary is the reference's own cmudict-en-us.dict (used in
place, not copied).  Deterministic (seed 13)."""

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

REF = os.environ.get("PS_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.environ.get("PS_REF_BIN", "/tmp/ref-build/pocketsphinx")

am = AcousticModel.load(REF + "/model/en-us/en-us")
full = Dictionary(am.mdef, REF + "/model/en-us/cmudict-en-us.dict",
                  REF + "/model/en-us/en-us/noisedict")

vocab = sorted({full.basestr(w) for w in range(len(full))
                if not full.is_filler(w)})
print(f"vocab: {len(vocab)} base words")

rng = random.Random(13)
sents = ["go forward ten meters"] * 50
for _ in range(200000):
    sents.append(" ".join(rng.sample(vocab, rng.randint(3, 8))))
print("building ARPA ...")
buf = io.StringIO()
ArpaBoLM(text="\n".join(sents), add_start=True,
         word_file=None).write(buf)
del sents
open("/tmp/bench135k.arpa", "w").write(buf.getvalue())
print("arpa chars:", len(buf.getvalue()))
del buf
lm = read_arpa("/tmp/bench135k.arpa")
print("counts:", lm.counts)
print("writing trie binary ...")
write_trie_bin(lm, HERE + "/bench_data/bench-135k.lm.bin")
print("wrote bench_data/bench-135k.lm.bin",
      os.path.getsize(HERE + "/bench_data/bench-135k.lm.bin"), "bytes")

# ---- reference-binary oracle on goforward under this task ----
os.makedirs(HERE + "/tests/golden/wer135k", exist_ok=True)
out = subprocess.run(
    [REF_BIN, "-hmm", REF + "/model/en-us/en-us",
     "-lm", HERE + "/bench_data/bench-135k.lm.bin",
     "-dict", REF + "/model/en-us/cmudict-en-us.dict",
     "single", REF + "/test/data/goforward.raw"],
    capture_output=True, text=True, check=True).stdout
hyp = json.loads(out)["t"]
print("reference hyp:", hyp)
with open(HERE + "/tests/golden/wer135k/ref.json", "w") as f:
    json.dump({"goforward": {"hyp": hyp,
                             "ref": "go forward ten meters"}}, f, indent=1)
print("wrote tests/golden/wer135k/ref.json")
