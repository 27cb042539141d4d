#!/usr/bin/env python3
"""Mesh-sharded corpus decoding — the TPU scale-out path."""
import os
import numpy as np
from pocketsphinx_tpu.models.acoustic import AcousticModel
from pocketsphinx_tpu.models.dict2pid import Dict2Pid
from pocketsphinx_tpu.fileio.dictionary import Dictionary
from pocketsphinx_tpu.frontend.mfcc import MelFrontend
from pocketsphinx_tpu.lm.ngram import read_lm
from pocketsphinx_tpu.search.ngram_flat import NgramFlatDecoder
from pocketsphinx_tpu.parallel import BatchDecodePipeline

REF = os.environ.get("PS_REFERENCE", "/root/reference")
am = AcousticModel.load(f"{REF}/model/en-us/en-us")
d = Dictionary(am.mdef, f"{REF}/test/data/turtle.dic",
               f"{REF}/model/en-us/en-us/noisedict")
lm = read_lm(f"{REF}/test/data/turtle.lm.bin", lw=6.5, wip=0.65)
dec = NgramFlatDecoder(am, Dict2Pid(am.mdef, d), lm)
fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                 lifter_val=22, remove_noise=True)
pipe = BatchDecodePipeline(dec, fe)   # mesh over all visible devices
pcm = np.frombuffer(open(f"{REF}/test/data/goforward.raw", "rb").read(),
                    dtype="<i2")
for hyp, segs in pipe.decode_corpus([pcm] * 8):
    print(hyp)
