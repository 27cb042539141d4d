#!/usr/bin/env python3
"""Minimal decoding example (examples/simple.py equivalent)."""
import os
from pocketsphinx_tpu.decoder import Decoder

REF = os.environ.get("PS_REFERENCE", "/root/reference")
d = Decoder(hmm=f"{REF}/model/en-us/en-us",
            lm=f"{REF}/test/data/turtle.lm.bin",
            dict=f"{REF}/test/data/turtle.dic")
hyp = d.decode_raw(open(f"{REF}/test/data/goforward.raw", "rb").read())
print(hyp.hypstr)
for seg in d.seg_iter():
    print(f"  {seg.word}\t{seg.start:.2f} +{seg.duration:.2f}\tp={seg.prob:.3f}")
