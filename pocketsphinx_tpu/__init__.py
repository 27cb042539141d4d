"""pocketsphinx-tpu: a TPU-native continuous speech recognizer.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
cmusphinx/pocketsphinx 5.1.1: MFCC frontend, GMM senone scoring,
time-synchronous Viterbi beam search (n-gram / FSG / JSGF / keyword /
allphone / forced-alignment modes), word lattices, best-path rescoring,
posterior confidence, N-best, VAD and endpointing — batched and sharded
over TPU device meshes.
"""

__version__ = "0.1.0"
