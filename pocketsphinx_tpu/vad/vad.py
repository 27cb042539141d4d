"""Voice activity detection (ps_vad_t equivalent, include/pocketsphinx/
vad.h + src/ps_vad.c).

The reference wraps the vendored WebRTC GMM VAD (src/common_audio/vad):
a 6-band energy front end feeding per-band 2x2-component noise/speech
GMMs with hangover logic.  This implementation keeps the same API
surface (modes 0-3, 10/20/30 ms frames, 8/16/32/48 kHz) and decision
structure (band energies -> adaptive noise model -> likelihood-ratio
votes with hysteresis), built on NumPy band filtering and running noise
percentile estimation rather than the WebRTC fixed-point tables.
A bit-exact WebRTC port can replace `classify` without touching callers.
"""

from __future__ import annotations

import numpy as np

# Modes (include/pocketsphinx/vad.h:62-70)
LOOSE = 0
MEDIUM_LOOSE = 1
MEDIUM_STRICT = 2
STRICT = 3

DEFAULT_SAMPLE_RATE = 16000
DEFAULT_FRAME_LENGTH = 0.03

# per-mode likelihood-ratio thresholds (stricter = larger)
_THRESH = {0: 2.0, 1: 3.0, 2: 4.5, 3: 6.5}


class Vad:
    def __init__(self, mode: int = LOOSE,
                 sample_rate: int = DEFAULT_SAMPLE_RATE,
                 frame_length: float = DEFAULT_FRAME_LENGTH):
        if sample_rate not in (8000, 16000, 32000, 48000):
            # closest supported, like ps_vad_init's resampling fallback
            sample_rate = min((8000, 16000, 32000, 48000),
                              key=lambda r: abs(r - sample_rate))
        if round(frame_length * 1000) not in (10, 20, 30):
            raise ValueError("frame_length must be 10, 20 or 30 ms")
        self.mode = mode
        self.sample_rate = sample_rate
        self.frame_length = frame_length
        self.frame_size = int(sample_rate * frame_length)
        self.thresh = _THRESH.get(mode, 2.0)
        # running noise floor per band (energy domain)
        self._noise = None
        self._hangover = 0
        # 6 bands ~ 80-250-500-1k-2k-3k-4k Hz (WebRTC band split)
        edges = np.array([80, 250, 500, 1000, 2000, 3000, 4000])
        self._edges = edges

    def _band_energies(self, frame: np.ndarray) -> np.ndarray:
        spec = np.fft.rfft(frame.astype(np.float64))
        power = np.abs(spec) ** 2
        freqs = np.fft.rfftfreq(len(frame), 1.0 / self.sample_rate)
        out = np.empty(6)
        for i in range(6):
            m = (freqs >= self._edges[i]) & (freqs < self._edges[i + 1])
            out[i] = power[m].sum() + 1e-10
        return out

    def classify(self, frame) -> bool:
        """One frame of int16 PCM (exactly frame_size samples) ->
        speech/not-speech."""
        frame = np.asarray(frame)
        if frame.dtype != np.int16 and frame.dtype.kind != "f":
            frame = frame.astype(np.int16)
        if len(frame) != self.frame_size:
            raise ValueError(
                f"frame must be {self.frame_size} samples, got {len(frame)}")
        e = self._band_energies(frame)
        if self._noise is None:
            self._noise = e.copy()
        # likelihood ratio per band against the adaptive noise floor
        ratio = np.log(e / self._noise)
        score = ratio.clip(0, None).sum()
        speech = score > self.thresh
        # adapt noise floor: fast down, slow up; only adapt on non-speech
        if not speech:
            self._noise = 0.9 * self._noise + 0.1 * e
        else:
            self._noise = np.minimum(0.999 * self._noise + 0.001 * e,
                                     np.maximum(self._noise, e))
        # hangover: stretch speech decisions (WebRTC-style hysteresis)
        if speech:
            self._hangover = 4 if self.mode < 2 else 2
            return True
        if self._hangover > 0:
            self._hangover -= 1
            return True
        return False
