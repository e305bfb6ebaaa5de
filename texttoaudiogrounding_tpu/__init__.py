"""texttoaudiogrounding_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Text-to-Audio Grounding.

Given a waveform and a natural-language phrase, the models predict per-frame
probabilities that the phrase's sound event is active; decoding turns those
probabilities into (onset, offset) segments scored with polyphonic SED metrics
(PSDS, threshold-AUC).

Capability surface mirrors the reference research codebase
(wsntxxn/TextToAudioGrounding) — strongly-supervised TAG, weakly-supervised
(WSTAG) MIL training, sentence-level alignment/retrieval, phrase→class-mapping
SED, zero-shot SED — but the implementation is designed TPU-first:

* static shapes + length masks everywhere (XLA-friendly ragged handling),
* the log-mel frontend is expressed as MXU matmuls (DFT-as-matmul),
* models are flax.linen modules returning the reference's output-dict
  contract ``{"frame_sim", "clip_sim", "length"}``,
* scaling is a ``jax.sharding.Mesh`` + ``shard_map`` data-parallel train step
  with ``psum`` gradient reduction (no NCCL analog needed),
* CPU-side decoding/metrics are vectorized NumPy.
"""

__version__ = "0.1.0"

# Populate the component registry so YAML configs resolve by short name.
from texttoaudiogrounding_tpu import losses as losses  # noqa: E402,F401
from texttoaudiogrounding_tpu import models as models  # noqa: E402,F401
from texttoaudiogrounding_tpu import data as data  # noqa: E402,F401
from texttoaudiogrounding_tpu.training import optim as _optim  # noqa: E402,F401
