"""Audio-text retrieval (CLAP-style) models — the aux model zoo used to
produce phrase/audio embeddings offline.

Reference: audio_text_retrieval_models/ (SURVEY §2.7).  Implemented here:
the PANNs ``Cnn14`` audio tower (the default embedding extractor) and the
``AudioTextClip`` / ``AudioSingleTextClip`` dual encoders with a learnable
logit scale and gradient-scaling (the reference's gradient-reversal-based
"gradient clip", audio_text_retrieval_models/audio_text_model.py:7-29,
realized here as a custom-VJP gradient scaler).  The ResNet38/AST towers
are interchangeable embedding producers and can be added behind the same
``{"clip_emb", "time_emb"}`` contract.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.models.layers import (
    ConvBlock,
    spec_augment,
    xavier_uniform,
)
from texttoaudiogrounding_tpu.ops.frontend import (
    cnn8rnn_mel_config,
    log_mel_spectrogram,
)
from texttoaudiogrounding_tpu.ops.masking import max_with_lens, mean_with_lens
from texttoaudiogrounding_tpu.utils.registry import register


@jax.custom_vjp
def grad_scale(x: jax.Array, alpha: float) -> jax.Array:
    return x


def _grad_scale_fwd(x, alpha):
    return x, alpha


def _grad_scale_bwd(alpha, g):
    return (alpha * g, None)


grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)


@register("Cnn14")
class Cnn14(nn.Module):
    """PANNs Cnn14 audio tower → ``{"clip_emb" [B, 2048], "time_emb"
    [B, T/32, 2048]}``.

    Reference: audio_text_retrieval_models/audio_encoder.py:76-185 — six
    avg-pooled ConvBlocks (÷32 in time), mean over mel, masked max+mean
    time pooling, FC2048+ReLU.
    """

    sample_rate: int = 32000
    embed_dim: int = 2048
    downsample_ratio: int = 32

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        waveform = input_dict["waveform"]
        cfg = cnn8rnn_mel_config(self.sample_rate)  # same 64-mel frontend
        x = log_mel_spectrogram(waveform, cfg)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)
        x = x[..., None]
        drop = lambda a: nn.Dropout(0.2, deterministic=not train)(a)
        for i, (ch, pool) in enumerate(((64, (2, 2)), (128, (2, 2)),
                                        (256, (2, 2)), (512, (2, 2)),
                                        (1024, (2, 2)), (2048, (1, 1))),
                                       start=1):
            x = drop(ConvBlock(ch, name=f"conv_block{i}")(
                x, bn_train=train, pool_size=pool, pool_type="avg"))
        x = jnp.mean(x, axis=2)                      # [B, T/32, 2048]
        time_emb = x

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length \
            + 1
        length = length // self.downsample_ratio
        pooled = (max_with_lens(time_emb, length)
                  + mean_with_lens(time_emb, length))
        pooled = nn.Dropout(0.5, deterministic=not train)(pooled)
        pooled = nn.relu(nn.Dense(2048, kernel_init=xavier_uniform,
                                  name="fc1")(pooled))
        clip_emb = nn.Dropout(0.5, deterministic=not train)(pooled)
        return {"clip_emb": clip_emb, "time_emb": time_emb,
                "length": length}


class RetrievalBert(nn.Module):
    """[CLS]-pooled text tower for retrieval (reference
    audio_text_retrieval_models/text_encoder.py:9-25) — returns
    ``clip_emb``."""

    cfg: "object"  # TextTowerConfig

    @property
    def embed_dim(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        from texttoaudiogrounding_tpu.models.pretrained_text import TextTower
        hidden, _ = TextTower(self.cfg, name="tower")(
            input_dict["input_ids"], input_dict["attention_mask"],
            input_dict.get("token_type_ids"), train=train)
        return {"clip_emb": hidden[:, 0], "token_emb": hidden}


def _norm_clip(x: jax.Array) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.clip(x / (norm + 1e-7), -1e3, 1e3)


@register("AudioTextClip")
class AudioTextClip(nn.Module):
    """CLIP-style dual encoder with learnable logit scale.

    Reference: audio_text_retrieval_models/audio_text_model.py:32-105.
    ``gradient_clip != 1`` scales encoder gradients (the reference
    implements this with a reversed-sign reversal layer).
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    audio_dim: int
    text_dim: int
    shared_dim: int
    audio_forward_keys: tuple = ("waveform", "waveform_len")
    text_forward_keys: tuple = ("input_ids", "token_type_ids",
                                "attention_mask")
    gradient_clip: float = 1.0

    def _encode_audio(self, input_dict, train):
        audio_emb = self.audio_encoder(input_dict,
                                       train=train)["clip_emb"]
        if self.gradient_clip != 1:
            audio_emb = grad_scale(audio_emb, self.gradient_clip)
        audio_emb = nn.Dense(self.shared_dim, name="audio_proj")(audio_emb)
        return _norm_clip(audio_emb)

    def _encode_text(self, text_input, train):
        text_emb = self.text_encoder(text_input, train=train)["clip_emb"]
        if self.gradient_clip != 1:
            text_emb = grad_scale(text_emb, self.gradient_clip)
        text_emb = nn.Dense(self.shared_dim, name="text_proj")(text_emb)
        return _norm_clip(text_emb)

    def _logit_scale(self):
        scale = self.param("logit_scale",
                           lambda *_: jnp.asarray(np.log(1 / 0.07),
                                                  jnp.float32))
        return jnp.exp(scale)

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        batch_size = input_dict["waveform"].shape[0]
        num_captions = input_dict.get("num_captions", 1)
        audio_emb = self._encode_audio(input_dict, train)
        text_input = {}
        for k in self.text_forward_keys:
            if k not in input_dict:
                continue
            v = jnp.asarray(input_dict[k])
            if v.ndim > 2:
                v = v.reshape(batch_size * num_captions, *v.shape[2:])
            text_input[k] = v
        text_emb = self._encode_text(text_input, train)
        text_emb = text_emb.reshape(batch_size, num_captions, -1)
        return {"audio_emb": audio_emb, "text_emb": text_emb,
                "logit_scale": self._logit_scale()}

    def encode_audio(self, input_dict: dict) -> jax.Array:
        return self._encode_audio(input_dict, False)

    def encode_text(self, text_input: dict) -> jax.Array:
        return self._encode_text(text_input, False)


@register("AudioSingleTextClip")
class AudioSingleTextClip(AudioTextClip):
    """One caption per audio (reference
    audio_text_retrieval_models/audio_text_model.py:108-139)."""

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_emb = self._encode_audio(input_dict, train)
        text_input = {k: jnp.asarray(input_dict[k])
                      for k in self.text_forward_keys if k in input_dict}
        text_emb = self._encode_text(text_input, train)
        return {"audio_emb": audio_emb, "text_emb": text_emb,
                "logit_scale": self._logit_scale()}
