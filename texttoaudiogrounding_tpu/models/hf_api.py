"""The released deployment model, as a named factory.

Reference: models/hf_modeling_grounding.py:305-352 —
``Cnn8RnnLaionClapGroundingModel`` is a BiEncoder of Cnn8Rnn + the
LAION-CLAP text tower + 512-d projections + scaled-sigmoid DotProduct,
with ``PretrainedConfig(sample_rate=32000, shared_dim=512,
text_encoder_name="laion/clap-htsat-fused")``.  Weights import via
``training.torch_import.import_hf_grounding``.
"""

from __future__ import annotations

import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.audio_encoder import Cnn8Rnn
from texttoaudiogrounding_tpu.models.audio_text_model import BiEncoder
from texttoaudiogrounding_tpu.models.match import DotProduct
from texttoaudiogrounding_tpu.models.pretrained_text import (
    ClapTextEncoder,
    TextTowerConfig,
)
from texttoaudiogrounding_tpu.utils.registry import register


def clap_text_config() -> TextTowerConfig:
    """laion/clap-htsat-fused text tower (RoBERTa-base shape)."""
    return TextTowerConfig(
        vocab_size=50265, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=514,
        type_vocab_size=1, layer_norm_eps=1e-5, dropout=0.1,
        pad_token_id=1, position_offset=2)


@register("Cnn8RnnLaionClapGroundingModel")
def cnn8rnn_laionclap_grounding_model(
        sample_rate: int = 32000, shared_dim: int = 512,
        projection_dim: int = 512, serving: bool = False,
        text_config: TextTowerConfig | None = None) -> BiEncoder:
    """Build the released grounding model architecture."""
    return BiEncoder(
        audio_encoder=Cnn8Rnn(
            sample_rate=sample_rate,
            dtype=jnp.bfloat16 if serving else jnp.float32),
        text_encoder=ClapTextEncoder(text_config or clap_text_config(),
                                     projection_dim=projection_dim),
        match_fn=DotProduct(),
        shared_dim=shared_dim, add_proj=True)
