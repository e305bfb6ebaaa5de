"""Audio encoders: waveform → frame embeddings + frame lengths.

Output contract (dict) matches the reference encoders
(models/audio_encoder.py:178-232): ``{"embedding": [B, T', D],
"length": [B]}`` with ``length = (waveform_len // hop + 1) //
downsample_ratio`` — evaluation timestamps derive from this arithmetic, so
it is reproduced exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.layers import (
    BiGRU,
    CDurBlock,
    ConvBlock,
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
from texttoaudiogrounding_tpu.utils.registry import register


def _fused_conv_modes(dtype, train: bool):
    """Per-block fused-kernel routing for the Cnn8Rnn conv trunk.

    ``TTG_FUSED_CONV=int8`` (serving on TPU in bf16 only) routes blocks
    3-4 through the fused int8 Pallas ConvBlock kernel
    (ops/pallas/conv_block.py, ~1.6x their bf16 time; dynamic activation
    quantization, parity delta documented in STATUS.md).
    ``TTG_FUSED_CONV=bf16`` uses the fused kernels without quantization.
    Block 2 routes through the Cin=64 parity-split pair kernel
    (ops/pallas/conv_block_pair.py, 7.6 ms int8 / 8.4 bf16 vs 10.2 XLA
    at B=128).  Block 1 routes through the Cin=1 pair kernel
    (ops/pallas/conv_block1_pair.py, round 4); ``TTG_FUSED_B1=0`` opts
    back to XLA for it.
    """
    import os

    if train or dtype != jnp.bfloat16:
        return (False, False, False, False)
    env = os.environ.get("TTG_FUSED_CONV", "0")
    if env not in ("bf16", "int8"):
        return (False, False, False, False)
    from texttoaudiogrounding_tpu.ops.pallas.logmel import pallas_supported
    if not pallas_supported():
        return (False, False, False, False)
    mode = "int8" if env == "int8" else True
    return (mode, mode, mode, mode)


@register("Cnn8Rnn")
@register("Cnn8_Rnn")
class Cnn8Rnn(nn.Module):
    """Primary audio encoder: 4 PANNs conv blocks + BiGRU, 40 ms frames.

    Reference: models/audio_encoder.py:89-232.  Pipeline: log-mel (64 slaney
    mels) → bn0 over the *mel* axis (the reference's bn0-over-mel quirk at
    models/audio_encoder.py:188-190) → 4 ConvBlocks (64→128→256→512,
    'avg+max' pooling, time ÷4, mel ÷16) → mean over mel → FC512 + ReLU →
    BiGRU(256×2) → ``[B, T/4, 512]``.

    ``freeze_cnn`` is realized by the optimizer mask (see training.optim),
    not by the module; ``freeze_bn`` makes every BatchNorm use running stats
    even in training (reference train() override :162-172).
    """

    sample_rate: int = 32000
    freeze_cnn: bool = False
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    downsample_ratio: int = 4
    time_resolution: float = 0.04
    embed_dim: int = 512

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        waveform = input_dict["waveform"]
        cfg = cnn8rnn_mel_config(self.sample_rate)
        # bf16 serving routes to the fused Pallas frontend on TPU
        x = log_mel_spectrogram(waveform, cfg,
                                compute_dtype=self.dtype)  # [B, T, 64]

        bn_train = train and not self.freeze_bn
        # bn0: BatchNorm over the mel axis (stats per mel bin)
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, name="bn0")(x)

        if train and input_dict.get("specaug", False):
            x = spec_augment(self.make_rng("specaug"), x)

        mixup_lambda = input_dict.get("mixup_lambda")
        if train and mixup_lambda is not None:
            x = do_mixup(x, mixup_lambda)

        x = x[..., None].astype(self.dtype)  # NHWC: [B, T, M, 1]
        drop = lambda a: nn.Dropout(0.2, deterministic=not train)(a)
        fused = _fused_conv_modes(self.dtype, train)
        import os
        remat_ids = os.environ.get("TTG_TRAIN_REMAT", "") if train else ""

        def block(i, ch, pool, xx, fz):
            blk = ConvBlock(ch, dtype=self.dtype, name=f"conv_block{i}")
            if str(i) in remat_ids:
                # checkpoint the block: its backward is HBM-bound on the
                # inter-conv activations, so recomputing can beat
                # re-reading (probe: scripts/probe_train_r4.py)
                return nn.remat(
                    lambda m, v: m(v, bn_train=bn_train, pool_size=pool,
                                   fused=fz),
                    prevent_cse=False)(blk, xx)
            return blk(xx, bn_train=bn_train, pool_size=pool, fused=fz)

        x = drop(block(1, 64, (2, 2), x, fused[0]))
        x = drop(block(2, 128, (2, 2), x, fused[1]))
        x = drop(block(3, 256, (1, 2), x, fused[2]))
        x = drop(block(4, 512, (1, 2), x, fused[3]))

        x = jnp.mean(x, axis=2)  # mean over mel → [B, T/4, 512]
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(512, kernel_init=xavier_uniform, name="fc1")(x))
        # serving in bf16 runs the recurrence on the bf16 MXU path too;
        # training keeps the f32 recurrence (reference parity)
        gru_dtype = self.dtype if not train else jnp.float32
        x = BiGRU(256, dtype=gru_dtype, name="rnn")(x.astype(jnp.float32))

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length + 1
        length = length // self.downsample_ratio
        if train and mixup_lambda is not None:
            # the reference keeps mixup'd lengths FLOAT (lam*l0 +
            # (1-lam)*l1) and masks with idx < length, so e.g. 12.6
            # keeps 13 frames; flooring to int here would drop a frame
            # from every unequal-length mixup pair's mask
            length = do_mixup(length.astype(jnp.float32), mixup_lambda)
        return {"embedding": x, "length": length}


@register("CrnnEncoder")
class CrnnEncoder(nn.Module):
    """CDur CRNN encoder (alt.): 5 CDur blocks with LP pooling + BiGRU.

    Reference: models/audio_encoder.py:25-86.  Frontend n_fft 2048 /
    40 ms win / 20 ms hop; time ÷4 (two (2,·) LP pools) so the effective
    time resolution is 0.08 s.
    """

    sample_rate: int = 32000
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    downsample_ratio: int = 4

    @property
    def time_resolution(self) -> float:
        return 20 * self.downsample_ratio / 1000.0

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        waveform = input_dict["waveform"]
        cfg = cdur_mel_config(self.sample_rate)
        x = log_mel_spectrogram(waveform, cfg,
                                compute_dtype=self.dtype)  # [B, T, 64]
        x = x[..., None].astype(self.dtype)     # [B, T, M, 1]

        x = CDurBlock(32)(x, bn_train=train)
        x = lp_pool_2d(x, 4, (2, 4))
        x = CDurBlock(128)(x, bn_train=train)
        x = CDurBlock(128)(x, bn_train=train)
        x = lp_pool_2d(x, 4, (2, 4))
        x = CDurBlock(128)(x, bn_train=train)
        x = CDurBlock(128)(x, bn_train=train)
        x = lp_pool_2d(x, 4, (1, 4))
        x = nn.Dropout(0.3, deterministic=not train)(x)

        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c)
        x = BiGRU(self.embed_dim // 2, name="gru")(x.astype(jnp.float32))

        length = jnp.asarray(input_dict["waveform_len"]) // cfg.hop_length + 1
        length = length // self.downsample_ratio
        return {"embedding": x, "length": length}
