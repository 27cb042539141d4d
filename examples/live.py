#!/usr/bin/env python3
"""Endpointer-segmented decoding of a long recording (live.py equivalent)."""
import os, sys
import numpy as np
from pocketsphinx_tpu.decoder import Decoder
from pocketsphinx_tpu.vad.endpointer import Endpointer
from pocketsphinx_tpu.fileio.sound import read_audio

REF = os.environ.get("PS_REFERENCE", "/root/reference")
d = Decoder(hmm=f"{REF}/model/en-us/en-us",
            lm=f"{REF}/test/data/turtle.lm.bin",
            dict=f"{REF}/test/data/turtle.dic")
path = sys.argv[1] if len(sys.argv) > 1 else f"{REF}/test/data/goforward.raw"
pcm, rate = read_audio(path)
ep = Endpointer(sample_rate=rate)
for start, end, speech in ep.segment(pcm):
    d.start_utt(); d.process_raw(speech); d.end_utt()
    print(f"[{start:.2f}-{end:.2f}] {d.hyp().hypstr}")
