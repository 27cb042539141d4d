"""Streaming recognition server — the GStreamer-element equivalent
(reference gst/gstpocketsphinx.c, component G1).

The reference ships a GStreamer element that consumes a raw PCM stream
inside a media pipeline and posts partial + final results on the bus.
The TPU-native integration point is the same contract as a process:
16-bit/16 kHz mono PCM in (stdin or a TCP socket), newline-delimited
JSON events out:

  {"event": "start",   "t": <stream-time-s>}
  {"event": "partial", "t": ..., "hyp": "..."}          (mid-utterance)
  {"event": "final",   "b": ..., "d": ..., "t": "...", "w": [...]}

driven by the WebRTC-VAD endpointer (vad/endpointer.py; sample-exact
parity with ps_endpointer) and the incremental decoder
(Decoder.process_raw streaming path + partial hyp(), mirroring the
element's 'partial_results' property).

Usage:
  python examples/stream_server.py --stdio  < audio.raw
  python examples/stream_server.py --listen 127.0.0.1:7350
  # then:  sox mic.wav -t raw -r 16000 -e signed -b 16 - | nc 127.0.0.1 7350

Options: -hmm/-lm/-dict and any decoder config via the usual flags,
--partial-every N (frames between partial events, default 30 = 0.3 s).
"""

import argparse
import json
import socket
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pocketsphinx_tpu.config import Config
from pocketsphinx_tpu.decoder import Decoder
from pocketsphinx_tpu.vad.endpointer import Endpointer


def serve(read_fn, write_fn, config, partial_every=30):
    dec = Decoder(config)
    ep = Endpointer(sample_rate=config["samprate"])
    frame_len = ep.frame_size              # samples per VAD frame
    buf = np.zeros(0, np.int16)
    stream_t = 0.0
    in_speech = False
    utt_start = 0.0
    frames_since_partial = 0
    frame_s = frame_len / float(config["samprate"])

    def emit(doc):
        write_fn((json.dumps(doc) + "\n").encode())

    def finish():
        nonlocal in_speech, frames_since_partial
        dec.end_utt()
        h = dec.hyp()
        if h is not None and h.hypstr:
            segs = [
                {"w": s.word, "b": round(utt_start + s.start, 3),
                 "d": round(s.duration, 3)}
                for s in dec.seg_iter()]
            emit({"event": "final", "b": round(utt_start, 3),
                  "d": round(stream_t - utt_start, 3), "t": h.hypstr,
                  "w": segs})
        in_speech = False
        frames_since_partial = 0

    while True:
        data = read_fn(2 * frame_len)
        if not data:
            break
        buf = np.concatenate(
            [buf, np.frombuffer(data, dtype="<i2")])
        while len(buf) >= frame_len:
            frame = buf[:frame_len]
            buf = buf[frame_len:]
            prev = in_speech
            speech_frame = ep.process(frame)
            now_speech = ep.in_speech
            if now_speech and not prev:
                utt_start = stream_t
                dec.start_utt()
                emit({"event": "start", "t": round(stream_t, 3)})
                in_speech = True
            # ps_endpointer_process returns the FINAL speech frame with
            # in_speech already False — it still belongs to the utterance
            if speech_frame is not None and (now_speech or prev):
                dec.process_raw(speech_frame)
                frames_since_partial += 1
                if now_speech and frames_since_partial >= partial_every:
                    frames_since_partial = 0
                    h = dec.partial_hyp()
                    if h is not None and h.hypstr:
                        emit({"event": "partial",
                              "t": round(stream_t, 3),
                              "hyp": h.hypstr})
            if prev and not now_speech:
                finish()
            stream_t += frame_s
    if in_speech:
        tail = ep.end_stream()
        if tail is not None and len(tail):
            dec.process_raw(tail)
        finish()


def main():
    # add_help=False + allow_abbrev=False so decoder flags like -hmm
    # are NOT swallowed as abbreviations of -h
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0], add_help=False,
        allow_abbrev=False)
    ap.add_argument("--help", action="help")
    ap.add_argument("--stdio", action="store_true")
    ap.add_argument("--listen", metavar="HOST:PORT")
    ap.add_argument("--partial-every", type=int, default=30)
    args, rest = ap.parse_known_args()
    cfg_kw = {}
    it = iter(rest)
    for tok in it:
        if tok.startswith("-"):
            cfg_kw[tok.lstrip("-")] = next(it, None)
    config = Config(**cfg_kw)

    if args.listen:
        host, port = args.listen.rsplit(":", 1)
        srv = socket.create_server((host, int(port)))
        sys.stderr.write(f"listening on {args.listen}\n")
        while True:
            conn, addr = srv.accept()
            sys.stderr.write(f"client {addr}\n")
            f = conn.makefile("rwb")
            try:
                serve(f.read, lambda b: (f.write(b), f.flush()),
                      config, args.partial_every)
            finally:
                f.close()
                conn.close()
    else:
        serve(sys.stdin.buffer.read,
              lambda b: (sys.stdout.buffer.write(b),
                         sys.stdout.buffer.flush()),
              config, args.partial_every)


if __name__ == "__main__":
    main()
