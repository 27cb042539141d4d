#!/usr/bin/env python3
"""VAD segmentation without decoding (segment.py equivalent)."""
import sys
from pocketsphinx_tpu.fileio.sound import read_audio
from pocketsphinx_tpu.vad.endpointer import Endpointer

pcm, rate = read_audio(sys.argv[1])
ep = Endpointer(sample_rate=rate)
for i, (start, end, speech) in enumerate(ep.segment(pcm)):
    print(f"segment {i}: {start:.2f}-{end:.2f} ({len(speech)/rate:.2f}s)")
