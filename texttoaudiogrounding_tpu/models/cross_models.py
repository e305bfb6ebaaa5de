"""Cross (FiLM-style) fused models: text injected additively into every
stage of a CDur / Cnn8Rnn trunk → frame probabilities directly.

Reference: models/audio_text_model.py:461-840.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.audio_text_model import _linear_upsample
from texttoaudiogrounding_tpu.models.layers import (
    do_mixup,
    lp_pool_2d,
    spec_augment,
    xavier_uniform,
)
from texttoaudiogrounding_tpu.ops.frontend import (
    cdur_mel_config,
    cnn8rnn_mel_config,
    log_mel_spectrogram,
)
from texttoaudiogrounding_tpu.models.layers import BiGRU
from texttoaudiogrounding_tpu.utils.registry import register


class CDurTextBlock(nn.Module):
    """BN → conv → +text bias → LeakyReLU (reference
    models/audio_text_model.py:461-479)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, text: jax.Array, *,
                 bn_train: bool) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.Conv(self.out_channels, (3, 3), use_bias=True,
                    padding="SAME", kernel_init=xavier_uniform,
                    name="conv")(x)
        t = nn.Dense(self.out_channels, kernel_init=xavier_uniform,
                     name="fc_text")(text)
        x = x + t[:, None, None, :]
        return nn.leaky_relu(x, negative_slope=0.1)


@register("CrossCDur")
class CrossCDur(nn.Module):
    """CDur trunk with text injection at every block + output head.

    Reference: models/audio_text_model.py:482-568.
    """

    sample_rate: int
    text_encoder: nn.Module
    upsample: bool = False

    downsample_ratio: int = 4

    @property
    def time_resolution(self) -> float:
        return 20 * self.downsample_ratio / 1000.0

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        text_emb = self.text_encoder(input_dict, train=train)["seq_emb"]
        cfg = cdur_mel_config(self.sample_rate)
        x = log_mel_spectrogram(input_dict["waveform"], cfg)[..., None]

        x = CDurTextBlock(32, name="block1")(x, text_emb, bn_train=train)
        x = lp_pool_2d(x, 4, (2, 4))
        x = CDurTextBlock(128, name="block2")(x, text_emb, bn_train=train)
        x = CDurTextBlock(128, name="block3")(x, text_emb, bn_train=train)
        x = lp_pool_2d(x, 4, (2, 4))
        x = CDurTextBlock(128, name="block4")(x, text_emb, bn_train=train)
        x = CDurTextBlock(128, name="block5")(x, text_emb, bn_train=train)
        x = lp_pool_2d(x, 4, (1, 4))
        x = nn.Dropout(0.3, deterministic=not train)(x)

        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c)
        x = BiGRU(128, name="gru")(x)
        x = x + nn.Dense(256, kernel_init=xavier_uniform,
                         name="fc_text")(text_emb)[:, None, :]
        logit = nn.Dense(1, kernel_init=xavier_uniform,
                         name="fc_output")(x)
        prob = jnp.clip(jax.nn.sigmoid(logit[..., 0]), 1e-7, 1.0)

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length + 1
        length = length // self.downsample_ratio
        if self.downsample_ratio != 1 and self.upsample:
            prob = _linear_upsample(prob[..., None],
                                    self.downsample_ratio)[..., 0]
            length = length * self.downsample_ratio
        return {"frame_sim": prob, "length": length}


class ConvTextBlock(nn.Module):
    """PANNs double conv with text bias after each BN (reference
    models/audio_text_model.py:571-636)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, text: jax.Array, *, bn_train: bool,
                 pool_size=(2, 2), pool_type: str = "avg+max") -> jax.Array:
        t = nn.Dense(self.out_channels, kernel_init=xavier_uniform,
                     name="fc_text")(text)[:, None, None, :]
        for name in ("conv1", "conv2"):
            x = nn.Conv(self.out_channels, (3, 3), use_bias=False,
                        padding="SAME", kernel_init=xavier_uniform,
                        name=name)(x)
            x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                             epsilon=1e-5, name=name.replace("conv", "bn"))(x)
            x = nn.relu(x + t)
        window = pool_size
        if pool_type == "max":
            return nn.max_pool(x, window, strides=window)
        if pool_type == "avg":
            return nn.avg_pool(x, window, strides=window)
        if pool_type == "avg+max":
            return (nn.avg_pool(x, window, strides=window)
                    + nn.max_pool(x, window, strides=window))
        raise ValueError(f"bad pool_type {pool_type}")


@register("CrossCnn8Rnn")
@register("CrossCnn8_Rnn")
class CrossCnn8Rnn(nn.Module):
    """Cnn8Rnn trunk with text injection at every stage.

    Reference: models/audio_text_model.py:639-840.  Note: output keeps the
    trailing singleton class axis ``[B, T, 1]`` exactly like the reference
    (:818-819); FrameBceLoss squeezes it.
    """

    sample_rate: int
    text_encoder: nn.Module
    freeze_cnn: bool = False
    freeze_bn: bool = False
    upsample: bool = False

    downsample_ratio: int = 4
    time_resolution: float = 0.04

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        text_emb = self.text_encoder(input_dict, train=train)["seq_emb"]
        cfg = cnn8rnn_mel_config(self.sample_rate)
        x = log_mel_spectrogram(input_dict["waveform"], cfg)

        bn_train = train and not self.freeze_bn
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)
        mixup_lambda = input_dict.get("mixup_lambda")
        if train and mixup_lambda is not None:
            x = do_mixup(x, mixup_lambda)
            text_emb = do_mixup(text_emb, mixup_lambda)
        x = x[..., None]

        drop = lambda a: nn.Dropout(0.2, deterministic=not train)(a)
        x = drop(ConvTextBlock(64, name="conv_block1")(
            x, text_emb, bn_train=bn_train, pool_size=(2, 2)))
        x = drop(ConvTextBlock(128, name="conv_block2")(
            x, text_emb, bn_train=bn_train, pool_size=(2, 2)))
        x = drop(ConvTextBlock(256, name="conv_block3")(
            x, text_emb, bn_train=bn_train, pool_size=(1, 2)))
        x = drop(ConvTextBlock(512, name="conv_block4")(
            x, text_emb, bn_train=bn_train, pool_size=(1, 2)))

        x = jnp.mean(x, axis=2)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(512, kernel_init=xavier_uniform,
                             name="fc1")(x)
                    + nn.Dense(512, kernel_init=xavier_uniform,
                               name="fc1_text")(text_emb)[:, None, :])
        x = BiGRU(256, name="rnn")(x)
        x = x + nn.Dense(512, kernel_init=xavier_uniform,
                         name="rnn_text")(text_emb)[:, None, :]
        logit = nn.Dense(1, kernel_init=xavier_uniform, name="fc_output")(x)
        prob = jnp.clip(jax.nn.sigmoid(logit), 1e-7, 1.0)  # [B, T, 1]

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length + 1
        length = length // self.downsample_ratio
        if self.downsample_ratio != 1 and self.upsample:
            prob = _linear_upsample(prob, self.downsample_ratio)
            length = length * self.downsample_ratio
        return {"frame_sim": prob, "length": length}
