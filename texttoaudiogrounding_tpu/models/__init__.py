import texttoaudiogrounding_tpu.models.audio_encoder  # noqa: F401 (registry)
import texttoaudiogrounding_tpu.models.text_encoder  # noqa: F401
import texttoaudiogrounding_tpu.models.match  # noqa: F401
import texttoaudiogrounding_tpu.models.align  # noqa: F401
import texttoaudiogrounding_tpu.models.cross_encoder  # noqa: F401
import texttoaudiogrounding_tpu.models.sim_pooling  # noqa: F401
import texttoaudiogrounding_tpu.models.audio_text_model  # noqa: F401
import texttoaudiogrounding_tpu.models.cross_models  # noqa: F401
import texttoaudiogrounding_tpu.models.align_models  # noqa: F401
import texttoaudiogrounding_tpu.models.pretrained_text  # noqa: F401
import texttoaudiogrounding_tpu.models.retrieval  # noqa: F401
import texttoaudiogrounding_tpu.models.retrieval_towers  # noqa: F401
import texttoaudiogrounding_tpu.models.hf_api  # noqa: F401

from texttoaudiogrounding_tpu.models.audio_encoder import Cnn8Rnn, CrnnEncoder
from texttoaudiogrounding_tpu.models.audio_text_model import (
    AudioTagging,
    BiEncoder,
    MultiTextBiEncoder,
)
from texttoaudiogrounding_tpu.models.text_encoder import EmbeddingAgg

__all__ = [
    "Cnn8Rnn",
    "CrnnEncoder",
    "BiEncoder",
    "MultiTextBiEncoder",
    "AudioTagging",
    "EmbeddingAgg",
]
