"""Bit-exact parity of the WebRTC VAD port and the endpointer against
the reference implementation.

Goldens in golden/vad/webrtc_parity.json were produced by tiny C
harnesses linked against the reference libpocketsphinx
(src/common_audio/vad via ps_vad_classify, src/ps_endpointer.c via
ps_endpointer_process/_end_stream), dumping per-frame decisions and
per-event (frame, nsamples, in_speech, speech_start, speech_end) plus a
rolling checksum of every emitted sample.  Equality here means the
`live` mode's segmentation is sample- and timestamp-identical to the
reference.
"""

import json

import numpy as np
import pytest

from conftest import DATADIR, GOLDEN

GOLD = json.loads((GOLDEN / "vad" / "webrtc_parity.json").read_text())


def _goforward(sr):
    pcm = np.frombuffer((DATADIR / "goforward.raw").read_bytes(), dtype="<i2")
    if sr == 8000:
        return pcm[::2]
    if sr == 32000:
        return np.repeat(pcm, 2)
    if sr == 48000:
        return np.repeat(pcm, 3)
    return pcm


@pytest.mark.parametrize("key", sorted(GOLD["vad"]))
def test_vad_core_bit_exact(key):
    from pocketsphinx_tpu.vad.webrtc import VadCore
    sr, mode, ms = map(int, key.split("_"))
    pcm = _goforward(sr)
    v = VadCore(mode)
    fs = sr * ms // 1000
    ours = "".join(str(min(v.process(sr, pcm[i * fs:(i + 1) * fs]), 1))
                   for i in range(len(pcm) // fs))
    assert ours == GOLD["vad"][key]


def _ep_events(pcm, sr):
    """Replays the reference `live` read loop and formats events exactly
    like the C oracle."""
    from pocketsphinx_tpu.vad.endpointer import Endpointer
    ep = Endpointer(sample_rate=sr)
    fs = ep.frame_size
    lines = []
    sm = 0
    fno = 0
    i = 0

    def emit(out, prev):
        nonlocal sm
        for v in out:
            sm = (sm * 31 + int(np.uint16(v))) & 0xFFFFFFFFFFFFFFFF
        lines.append(
            f"{fno} out={len(out)} prev={int(prev)} in={int(ep.in_speech)} "
            f"start={ep.speech_start:.4f} end={ep.speech_end:.4f}")

    while i + fs <= len(pcm):
        prev = ep.in_speech
        out = ep.process(pcm[i:i + fs])
        if out is not None:
            emit(out, prev)
        fno += 1
        i += fs
    tail = pcm[i:]
    if len(tail):
        prev = ep.in_speech
        out = ep.end_stream(tail)
        if out is not None:
            emit(out, prev)
    elif ep.in_speech:
        out = ep.end_stream(None)
        if out is not None:
            emit(out, True)
    lines.append(f"CHECKSUM {sm}")
    return lines


@pytest.mark.parametrize("name", sorted(GOLD["endpointer"]))
def test_endpointer_bit_exact(name):
    if name == "goforward.raw":
        pcm, sr = _goforward(16000), 16000
    else:
        import wave
        with wave.open(str(DATADIR / "librivox" / name)) as f:
            sr = f.getframerate()
            pcm = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    assert _ep_events(pcm, sr) == GOLD["endpointer"][name]
