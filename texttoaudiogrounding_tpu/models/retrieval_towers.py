"""Additional retrieval audio towers: ResNet38, Wavegram-Logmel-Cnn14, AST.

Reference: audio_text_retrieval_models/audio_encoder.py:188-865.  All three
serve the same ``{"clip_emb", "time_emb"}`` embedding-producer contract as
Cnn14 (SURVEY §2.7); the AST is a clean ViT on spectrogram patches (the
reference performs timm surgery; timm is not in this image).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.layers import (
    ConvBlock,
    spec_augment,
    xavier_uniform,
)
from texttoaudiogrounding_tpu.ops.frontend import (
    LogMelConfig,
    cnn8rnn_mel_config,
    log_mel_spectrogram,
)
from texttoaudiogrounding_tpu.ops.masking import max_with_lens, mean_with_lens
from texttoaudiogrounding_tpu.utils.registry import register


def _clip_pool(time_emb, length, train, fc_name, parent):
    pooled = (max_with_lens(time_emb, length)
              + mean_with_lens(time_emb, length))
    pooled = nn.Dropout(0.5, deterministic=not train)(pooled)
    pooled = nn.relu(nn.Dense(time_emb.shape[-1],
                              kernel_init=xavier_uniform,
                              name=fc_name)(pooled))
    return nn.Dropout(0.5, deterministic=not train)(pooled)


class ResnetBasicBlock(nn.Module):
    """PANNs ResNet basic block: pre-avg-pool stride, dropout between
    convs, residual add (reference :369-424)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        out = x
        if self.stride == 2:
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=xavier_uniform, name="conv1")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=xavier_uniform, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, scale_init=nn.initializers.zeros,
                           name="bn2")(out)
        if self.use_downsample:
            if self.stride == 2:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
            identity = nn.Conv(self.planes, (1, 1), use_bias=False,
                               kernel_init=xavier_uniform,
                               name="downsample_conv")(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


@register("ResNet38")
class ResNet38(nn.Module):
    """PANNs ResNet38 tower (reference :486-657): ConvBlock stem →
    basic-block stages [3, 4, 6, 3] (64/128/256/512) → ConvBlock(2048)."""

    sample_rate: int = 32000
    embed_dim: int = 2048
    downsample_ratio: int = 32

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        cfg = cnn8rnn_mel_config(self.sample_rate)
        x = log_mel_spectrogram(input_dict["waveform"], cfg)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)
        x = x[..., None]
        x = ConvBlock(64, name="conv_block1")(x, bn_train=train,
                                              pool_size=(2, 2),
                                              pool_type="avg")
        x = nn.Dropout(0.2, deterministic=not train)(x)
        inplanes = 64
        for stage, (planes, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))):
            for i in range(blocks):
                s = stride if i == 0 else 1
                down = i == 0 and (s != 1 or inplanes != planes)
                x = ResnetBasicBlock(planes, stride=s, use_downsample=down,
                                     name=f"layer{stage + 1}_block{i}")(
                    x, train=train)
            inplanes = planes
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = ConvBlock(2048, name="conv_block_after1")(
            x, bn_train=train, pool_size=(1, 1), pool_type="avg")
        x = nn.Dropout(0.2, deterministic=not train)(x)
        time_emb = jnp.mean(x, axis=2)

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length \
            + 1
        length = length // self.downsample_ratio
        clip_emb = _clip_pool(time_emb, length, train, "fc1", self)
        return {"clip_emb": clip_emb, "time_emb": time_emb,
                "length": length}


class ConvPreWavBlock(nn.Module):
    """1-D pre-conv block of the wavegram branch (reference :188-222)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, *, train: bool, pool_size: int):
        for i, dilation in enumerate((1, 2), start=1):
            x = nn.Conv(self.out_channels, (3,), padding=[(dilation,
                                                           dilation)],
                        kernel_dilation=(dilation,), use_bias=False,
                        kernel_init=xavier_uniform, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.max_pool(x, (pool_size,), strides=(pool_size,))


@register("Wavegram_Logmel_Cnn14")
class WavegramLogmelCnn14(nn.Module):
    """Dual-branch tower: learned 1-D wavegram + log-mel, concatenated
    after the first conv block (reference :225-356)."""

    sample_rate: int = 32000
    embed_dim: int = 2048
    downsample_ratio: int = 32

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        waveform = input_dict["waveform"]
        drop = lambda a: nn.Dropout(0.2, deterministic=not train)(a)

        # wavegram branch: [B, N, 1] → strided conv + 3 pre blocks (÷320)
        a = waveform[..., None]
        a = nn.Conv(64, (11,), strides=(5,), padding=[(5, 5)],
                    use_bias=False, kernel_init=xavier_uniform,
                    name="pre_conv0")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="pre_bn0")(a)
        a = nn.relu(a)
        a = ConvPreWavBlock(64, name="pre_block1")(a, train=train,
                                                   pool_size=4)
        a = ConvPreWavBlock(128, name="pre_block2")(a, train=train,
                                                    pool_size=4)
        a = ConvPreWavBlock(128, name="pre_block3")(a, train=train,
                                                    pool_size=4)
        # [B, T, 128] → [B, T, 32, 4] freq-like axis (reference :297)
        b_, t_, c_ = a.shape
        a = a.reshape(b_, t_, 4, 32).transpose(0, 1, 3, 2)
        a = ConvBlock(64, name="pre_block4")(a, bn_train=train,
                                             pool_size=(2, 1),
                                             pool_type="avg")

        cfg = cnn8rnn_mel_config(self.sample_rate)
        x = log_mel_spectrogram(waveform, cfg)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)
        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)
        x = x[..., None]
        x = ConvBlock(64, name="conv_block1")(x, bn_train=train,
                                              pool_size=(2, 2),
                                              pool_type="avg")
        t = min(x.shape[1], a.shape[1])
        x = jnp.concatenate([x[:, :t], a[:, :t, :x.shape[2]]], axis=-1)
        x = drop(x)
        for i, ch in ((2, 128), (3, 256), (4, 512), (5, 1024)):
            x = drop(ConvBlock(ch, name=f"conv_block{i}")(
                x, bn_train=train, pool_size=(2, 2), pool_type="avg"))
        x = drop(ConvBlock(2048, name="conv_block6")(
            x, bn_train=train, pool_size=(1, 1), pool_type="avg"))
        time_emb = jnp.mean(x, axis=2)

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length \
            + 1
        length = length // self.downsample_ratio
        clip_emb = _clip_pool(time_emb, length, train, "fc1", self)
        return {"clip_emb": clip_emb, "time_emb": time_emb,
                "length": length}


@register("AudioSpectrogramTransformer")
@register("AST")
class AudioSpectrogramTransformer(nn.Module):
    """AST: ViT over overlapping 16x16 spectrogram patches.

    Reference: audio_text_retrieval_models/audio_encoder.py:661-865 (timm
    DeiT surgery there; a native transformer here).  Patches stride
    (tstride, fstride) over a [T, input_fdim] log-mel; CLS+distill tokens;
    ``clip_emb`` is their post-norm average.
    """

    sample_rate: int = 32000
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    embed_dim: int = 768

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        from texttoaudiogrounding_tpu.models.pretrained_text import (
            TextTowerConfig,
            TransformerLayer,
        )

        cfg = LogMelConfig(
            sample_rate=self.sample_rate,
            n_fft=32 * self.sample_rate // 1000,
            win_length=32 * self.sample_rate // 1000,
            hop_length=10 * self.sample_rate // 1000,
            n_mels=self.input_fdim, f_min=50.0,
            f_max=14000.0 if self.sample_rate == 32000
            else self.sample_rate / 2,
            norm="slaney", mel_scale="slaney")
        x = log_mel_spectrogram(input_dict["waveform"], cfg)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="init_bn")(x)
        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)

        # overlapping 16x16 patches via conv (reference PatchEmbed :661)
        x = nn.Conv(self.hidden_size, (16, 16),
                    strides=(self.tstride, self.fstride), padding="VALID",
                    name="patch_embed")(x[..., None])
        b, tp, fp, h = x.shape
        tokens = x.reshape(b, tp * fp, h)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, h))
        dist = self.param("dist_token", nn.initializers.normal(0.02),
                          (1, 1, h))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, tp * fp + 2, h))
        tokens = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(dist, (b, 1, 1)), tokens],
            axis=1) + pos
        tokens = nn.Dropout(0.1, deterministic=not train)(tokens)

        layer_cfg = TextTowerConfig(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, intermediate_size=self.mlp_dim,
            dropout=0.0, layer_norm_eps=1e-6)
        mask = jnp.ones((b, tokens.shape[1]), bool)
        for i in range(self.num_layers):
            tokens = TransformerLayer(layer_cfg, name=f"layer_{i}")(
                tokens, mask, train=train)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)

        clip_emb = (tokens[:, 0] + tokens[:, 1]) / 2
        # time_emb: patch tokens averaged over the frequency-patch axis
        time_emb = tokens[:, 2:].reshape(b, tp, fp, h).mean(axis=2)
        length = jnp.full((b,), tp, jnp.int32)
        return {"clip_emb": clip_emb, "time_emb": time_emb,
                "length": length}
