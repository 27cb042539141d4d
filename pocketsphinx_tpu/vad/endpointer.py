"""Utterance endpointing (ps_endpointer_t, src/ps_endpointer.c re-design).

Ring buffer of VAD-labeled frames; speech starts when `ratio` of the
`window` is speech, ends when `ratio` of the window is non-speech
(include/pocketsphinx/endpointer.h:75-81: default 0.3 s window, 0.9
ratio).  On speech start, the buffered frames are emitted so no audio is
lost; timestamps follow the reference's stream-position accounting.
"""

from __future__ import annotations

import numpy as np

from .vad import Vad, DEFAULT_FRAME_LENGTH

DEFAULT_WINDOW = 0.3
DEFAULT_RATIO = 0.9


class Endpointer:
    def __init__(self, window: float = DEFAULT_WINDOW,
                 ratio: float = DEFAULT_RATIO, vad_mode: int = 0,
                 sample_rate: int = 16000,
                 frame_length: float = DEFAULT_FRAME_LENGTH):
        self.vad = Vad(vad_mode, sample_rate, frame_length)
        self.frame_size = self.vad.frame_size
        self.frame_length = self.vad.frame_length
        self.sample_rate = self.vad.sample_rate
        self.maxlen = max(1, int(window / frame_length))
        self.n_start = max(1, int(ratio * self.maxlen))
        self.n_end = max(1, int(ratio * self.maxlen))
        self.reset()

    def reset(self):
        self._queue: list[tuple[np.ndarray, bool]] = []
        self.in_speech = False
        self.speech_start = 0.0
        self.speech_end = 0.0
        self._timestamp = 0.0

    @property
    def timestamp(self) -> float:
        return self._timestamp

    def process(self, frame: np.ndarray):
        """One frame in -> (speech frames out or None).  Mirrors
        ps_endpointer_process: returns buffered speech on transition into
        speech, the current frame while in speech, None otherwise."""
        frame = np.asarray(frame, dtype=np.int16)
        is_speech = self.vad.classify(frame)
        self._timestamp += self.frame_length
        self._queue.append((frame.copy(), is_speech))
        if len(self._queue) > self.maxlen:
            self._queue.pop(0)
        speech_count = sum(1 for _, s in self._queue if s)
        if not self.in_speech:
            if speech_count >= self.n_start:
                self.in_speech = True
                self.speech_start = (self._timestamp
                                     - len(self._queue) * self.frame_length)
                out = np.concatenate([f for f, _ in self._queue])
                self._queue.clear()
                return out
            return None
        else:
            if len(self._queue) == self.maxlen \
                    and (len(self._queue) - speech_count) >= self.n_end:
                # end of speech: emit leading speech frames, then stop
                self.in_speech = False
                out = []
                for f, s in self._queue:
                    if not s:
                        break
                    out.append(f)
                self.speech_end = (self._timestamp
                                   - (len(self._queue) - len(out))
                                   * self.frame_length)
                self._queue.clear()
                return np.concatenate(out) if out else None
            # still in speech: pass through the oldest queued frame
            f, _ = self._queue.pop(0)
            return f

    def end_stream(self, frame=None):
        """Flush at end of input (ps_endpointer_end_stream)."""
        out = []
        if self.in_speech:
            for f, s in self._queue:
                if not s:
                    break
                out.append(f)
            self.in_speech = False
        self._queue.clear()
        if frame is not None and len(out):
            out.append(np.asarray(frame, dtype=np.int16))
        self.speech_end = self._timestamp
        return np.concatenate(out) if out else None

    # -- convenience ---------------------------------------------------------

    def segment(self, pcm: np.ndarray):
        """Whole-buffer segmentation: yields (start_sec, end_sec,
        speech_pcm) utterances (the Segmenter class of the reference's
        python package)."""
        pcm = np.asarray(pcm, dtype=np.int16)
        fs = self.frame_size
        cur: list[np.ndarray] = []
        start = 0.0
        for i in range(0, len(pcm) - fs + 1, fs):
            out = self.process(pcm[i:i + fs])
            if out is not None:
                if not cur:
                    start = self.speech_start
                cur.append(out)
            if not self.in_speech and cur:
                yield (max(start, 0.0), self.speech_end,
                       np.concatenate(cur))
                cur = []
        tail = self.end_stream(pcm[len(pcm) - (len(pcm) % fs):]
                               if len(pcm) % fs else None)
        if tail is not None:
            cur.append(tail)
        if cur:
            yield (max(start, 0.0), self._timestamp, np.concatenate(cur))
