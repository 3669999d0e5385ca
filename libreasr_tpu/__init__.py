"""libreasr_tpu — a TPU-native streaming speech-recognition framework.

A from-scratch rebuild of the capabilities of iceychris/LibreASR
(reference mounted at /root/reference) designed TPU-first:

- compute path: JAX / XLA / Pallas / pjit (no torch anywhere)
- streaming state is explicit functional carry threaded through jitted
  programs (vs the reference's Python object state, models.py:457-577)
- RNN-T loss / fused RNN cells are on-device kernels (vs warp_rnnt CUDA
  and haste CUDA externs, loss.py:77, custom_rnn.py:25-44)
- decoding is a batched fixed-shape device loop (vs the per-frame Python
  loop, models.py:405-443)
- host-side runtime pieces (audio I/O, BPE tokenizer, edit distance) are
  native C++ with ctypes bindings (vs torchaudio/sox, youtokentome,
  editdistance externs)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (kept lazy so `libreasr_tpu.native`
    works without pulling jax/flax)."""
    if name == "ASRBundle":
        from .api import ASRBundle

        return ASRBundle
    if name == "StreamingEngine":
        from .models.streaming import StreamingEngine

        return StreamingEngine
    if name == "Learner":
        from .training.learner import Learner

        return Learner
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
