"""pocketsphinx-tpu: a TPU-native continuous speech recognizer.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
cmusphinx/pocketsphinx 5.1.1: MFCC frontend, GMM senone scoring,
time-synchronous Viterbi beam search (n-gram / FSG / JSGF / keyword /
allphone / forced-alignment modes), word lattices, best-path rescoring,
posterior confidence, N-best, VAD and endpointing — batched and sharded
over TPU device meshes.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: TPU first-compiles are tens of
    seconds; caching makes repeated CLI invocations fast.  Opt out with
    PS_TPU_NO_CACHE=1."""
    if _os.environ.get("PS_TPU_NO_CACHE"):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "pocketsphinx-tpu-jax"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _select_device():
    """Optional device pinning: PS_TPU_DEVICE=cpu forces the host
    platform (useful for tests or when the accelerator is busy);
    unset = JAX default."""
    plat = _os.environ.get("PS_TPU_DEVICE")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_default_device", jax.devices(plat)[0])
    except Exception:
        pass


_enable_compilation_cache()
_select_device()


def __getattr__(name):
    """Lazy top-level API (parity with `from pocketsphinx import ...`,
    cython/pocketsphinx/__init__.py exports) without importing jax at
    package-import time."""
    if name in ("Decoder", "Config", "Hypothesis", "Segment"):
        from . import decoder as _d
        from .config import Config as _C
        return {"Decoder": _d.Decoder, "Config": _C,
                "Hypothesis": _d.Hypothesis, "Segment": _d.Segment}[name]
    if name in ("Pocketsphinx", "AudioFile", "LiveSpeech", "Segmenter"):
        from . import compat as _c
        return getattr(_c, name)
    if name == "Endpointer":
        from .vad.endpointer import Endpointer as _E
        return _E
    if name == "Vad":
        from .vad.vad import Vad as _V
        return _V
    if name == "err":
        # logging subsystem (err_set_loglevel/logfile/callback parity,
        # include/pocketsphinx/err.h).  importlib, not `from . import`:
        # the latter re-enters this __getattr__ before the submodule is
        # registered and recurses.
        import importlib
        return importlib.import_module(".err", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
