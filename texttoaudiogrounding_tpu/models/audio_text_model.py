"""Composite audio-text grounding models.

Output-dict contract matches the reference (models/audio_text_model.py):
``{"frame_sim", "clip_sim"?, "length", "sentence_sim"?, "sim_matrix"?}`` —
losses, evaluation and the public inference API all key off it.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.masking import (
    exp_softmax_with_lens,
    linear_softmax_with_lens,
    max_with_lens,
    mean_with_lens,
)
from texttoaudiogrounding_tpu.utils.registry import register

_POOLINGS = {
    "linear_softmax": linear_softmax_with_lens,
    "max": max_with_lens,
    "mean": mean_with_lens,
    "exp_softmax": exp_softmax_with_lens,
}


def _text_out_dim(text_encoder: nn.Module) -> int:
    """Output dim of a text encoder (reference keeps it as .embed_dim)."""
    if hasattr(text_encoder, "out_dim"):
        return text_encoder.out_dim
    return text_encoder.embed_dim


def _linear_upsample(frame_sim: jax.Array, ratio: int) -> jax.Array:
    """torch ``F.interpolate(mode='linear', align_corners=False)`` on the
    time axis (axis 1)."""
    shape = list(frame_sim.shape)
    shape[1] = shape[1] * ratio
    return jax.image.resize(frame_sim, shape, method="linear")


def _project_text(text_emb: dict, text_proj: Optional[Callable]) -> dict:
    if text_proj is None:
        return text_emb
    out = dict(text_emb)
    for k in ("seq_emb", "token_emb"):
        if k in out:
            out[k] = text_proj(out[k])
    return out


def _multi_text_frame_sim(
    match_fn: nn.Module,
    cross_encoder: Optional[nn.Module],
    text_proj: Optional[Callable],
    audio_emb: jax.Array,          # [B, T, D] (already audio-projected)
    audio_len: jax.Array,          # [B]
    text_emb: dict,                # leaves [B*N, ...] (pre-projection)
    text_len: jax.Array,           # [B*N]
    batch_size: int,
    text_num: int,
    train: bool,
) -> jax.Array:
    """Phrase-branch core shared by the multi-text models → [B, T, N].

    TPU redesign of reference models/audio_text_model.py:147-210: with a
    seq-level ``pairwise`` match fn and no cross encoder, the B·N audio
    broadcast (+ ``safe_size`` chunk loop) collapses into one einsum.
    """
    use_pairwise = (cross_encoder is None
                    and hasattr(match_fn, "pairwise")
                    and getattr(match_fn, "text_level", "seq") == "seq")
    if use_pairwise:
        seq_emb = text_emb["seq_emb"]
        if text_proj is not None:
            seq_emb = text_proj(seq_emb)
        seq_emb = seq_emb.reshape(batch_size, text_num, -1)
        frame_sim = match_fn.pairwise(audio_emb, seq_emb)     # [B, N, T]
        return jnp.swapaxes(frame_sim, 1, 2)                  # [B, T, N]

    # reference-style broadcast path (token-level match fns, cross encoders)
    b, t, d = audio_emb.shape
    audio_b = jnp.broadcast_to(audio_emb[:, None], (b, text_num, t, d))
    audio_b = audio_b.reshape(-1, t, d)
    forward_dict: dict[str, Any] = {
        "audio_emb": audio_b,
        "text_emb": text_emb,
        "audio_len": jnp.repeat(audio_len, text_num),
        "text_len": text_len,
    }
    if cross_encoder is not None:
        forward_dict.update(cross_encoder(forward_dict, train=train))
    forward_dict["text_emb"] = _project_text(forward_dict["text_emb"],
                                             text_proj)
    frame_sim = match_fn(forward_dict, train=train)           # [B*N, T]
    frame_sim = frame_sim.reshape(batch_size, text_num, -1)
    return jnp.swapaxes(frame_sim, 1, 2)


@register("BiEncoder")
class BiEncoder(nn.Module):
    """Audio encoder + text encoder (+ optional cross encoder / projections)
    + match_fn → ``frame_sim [B, T]``.

    Reference: models/audio_text_model.py:16-98.  ``freeze_*`` flags are
    honored by the optimizer mask (training.optim), not by the module.
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    shared_dim: int = 512
    cross_encoder: Optional[nn.Module] = None
    add_proj: bool = False
    upsample: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False

    def _needs_proj(self) -> bool:
        return (self.audio_encoder.embed_dim
                != _text_out_dim(self.text_encoder)) or self.add_proj

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        text_emb = dict(self.text_encoder(input_dict, train=train))
        forward_dict: dict[str, Any] = {
            "audio_emb": audio_output["embedding"],
            "text_emb": text_emb,
            "audio_len": audio_output["length"],
        }
        if "text_len" in input_dict:
            forward_dict["text_len"] = input_dict["text_len"]
        if self.cross_encoder is not None:
            forward_dict.update(
                self.cross_encoder(forward_dict, train=train))
        if self._needs_proj():
            audio_proj = nn.Dense(self.shared_dim, name="audio_proj")
            text_proj = nn.Dense(self.shared_dim, name="text_proj")
            forward_dict["audio_emb"] = audio_proj(forward_dict["audio_emb"])
            forward_dict["text_emb"] = _project_text(
                forward_dict["text_emb"], text_proj)
        frame_sim = self.match_fn(forward_dict, train=train)  # [B, T]
        length = audio_output["length"]
        ratio = self.audio_encoder.downsample_ratio
        if ratio != 1 and self.upsample:
            frame_sim = _linear_upsample(frame_sim[..., None], ratio)[..., 0]
            length = length * ratio
        return {"frame_sim": frame_sim, "length": length}


@register("MultiTextBiEncoder")
class MultiTextBiEncoder(nn.Module):
    """WSTAG model: one audio vs N phrases → ``frame_sim [B, T, N]`` +
    MIL-pooled ``clip_sim [B, N]``.

    Reference: models/audio_text_model.py:101-229.
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    shared_dim: int = 512
    text_forward_keys: tuple = ("text", "text_len")
    cross_encoder: Optional[nn.Module] = None
    pooling: str = "linear_softmax"
    add_proj: bool = False
    upsample: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False

    def _needs_proj(self) -> bool:
        return (self.audio_encoder.embed_dim
                != _text_out_dim(self.text_encoder)) or self.add_proj

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        audio_emb = audio_output["embedding"]
        audio_proj = text_proj = None
        if self._needs_proj():
            audio_proj = nn.Dense(self.shared_dim, name="audio_proj")
            text_proj = nn.Dense(self.shared_dim, name="text_proj")
            audio_emb = audio_proj(audio_emb)

        keys = list(self.text_forward_keys)
        if "text_len" not in keys:
            keys.append("text_len")
        batch_size, text_num = input_dict[keys[0]].shape[:2]
        text_forward = {
            k: jnp.asarray(input_dict[k]).reshape(
                -1, *jnp.asarray(input_dict[k]).shape[2:])
            for k in keys
        }
        text_emb = dict(self.text_encoder(text_forward, train=train))

        frame_sim = _multi_text_frame_sim(
            self.match_fn, self.cross_encoder, text_proj,
            audio_emb, audio_output["length"], text_emb,
            text_forward["text_len"], batch_size, text_num, train)

        length = audio_output["length"]
        clip_sim = _POOLINGS[self.pooling](frame_sim, length)   # [B, N]
        ratio = self.audio_encoder.downsample_ratio
        if ratio != 1 and self.upsample:
            frame_sim = _linear_upsample(frame_sim, ratio)
            length = length * ratio
        return {"frame_sim": frame_sim, "clip_sim": clip_sim,
                "length": length}


@register("MultiTextBiEncoderWithAlign")
class MultiTextBiEncoderWithAlign(nn.Module):
    """WSTAG + sentence-level branch: positive-phrase embeddings →
    align_fn ``[B, B, T, N]`` → sentence pooling → ``sentence_sim [B, B]``.

    Reference: models/audio_text_model.py:232-402.  Static-shape note: the
    reference slices the first ``label.sum(1)`` (positive) phrases per
    sample and zero-pads (:379-385); because positives always come first
    and every sentence pooling masks by ``text_len``, running the align
    over *all* N phrases with ``text_len = label.sum(1)`` is equivalent
    and keeps shapes static.
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    align_fn: nn.Module
    sentence_pooling: nn.Module
    shared_dim: int = 512
    text_forward_keys: tuple = ("text", "text_len")
    cross_encoder: Optional[nn.Module] = None
    phrase_pooling: str = "linear_softmax"
    add_proj: bool = False
    upsample: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False

    def _needs_proj(self) -> bool:
        return (self.audio_encoder.embed_dim
                != _text_out_dim(self.text_encoder)) or self.add_proj

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        audio_emb = audio_output["embedding"]
        audio_proj = text_proj = None
        if self._needs_proj():
            audio_proj = nn.Dense(self.shared_dim, name="audio_proj")
            text_proj = nn.Dense(self.shared_dim, name="text_proj")
            audio_emb = audio_proj(audio_emb)

        keys = list(self.text_forward_keys)
        if "text_len" not in keys:
            keys.append("text_len")
        batch_size, text_num = input_dict[keys[0]].shape[:2]
        text_forward = {
            k: jnp.asarray(input_dict[k]).reshape(
                -1, *jnp.asarray(input_dict[k]).shape[2:])
            for k in keys
        }
        text_emb = dict(self.text_encoder(text_forward, train=train))

        frame_sim = _multi_text_frame_sim(
            self.match_fn, self.cross_encoder, text_proj,
            audio_emb, audio_output["length"], text_emb,
            text_forward["text_len"], batch_size, text_num, train)

        length = audio_output["length"]
        clip_sim = _POOLINGS[self.phrase_pooling](frame_sim, length)
        ratio = self.audio_encoder.downsample_ratio
        if ratio != 1 and self.upsample:
            frame_sim = _linear_upsample(frame_sim, ratio)
            length = length * ratio
        output = {"frame_sim": frame_sim, "clip_sim": clip_sim,
                  "length": length}

        if not train and "label" not in input_dict:
            return output

        # sentence-level branch over positive phrases (they come first)
        seq_emb = text_emb["seq_emb"].reshape(batch_size, text_num, -1)
        pos_num = jnp.sum(input_dict["label"], axis=1).astype(jnp.int32)
        sim_matrix = self.align_fn(audio_emb, seq_emb)   # [B, B, T, N]
        output["sentence_sim"] = self.sentence_pooling({
            "sim": sim_matrix,
            "audio_len": audio_output["length"],
            "text_len": pos_num,
        })
        if input_dict.get("output_matrix", False):
            output["sim_matrix"] = sim_matrix
        return output


@register("AudioTagging")
class AudioTagging(nn.Module):
    """Audio encoder + per-class sigmoid FC + MIL pooling (class-mapping
    paradigm).  Reference: models/audio_text_model.py:405-458."""

    audio_encoder: nn.Module
    classes_num: int
    pooling: str = "linear_softmax"

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        output = self.audio_encoder(input_dict, train=train)
        logit = nn.Dense(self.classes_num, name="fc_output")(
            output["embedding"])
        prob = jax.nn.sigmoid(logit)                      # [B, T, C]
        clip_prob = _POOLINGS[self.pooling](prob, output["length"])
        return {"frame_sim": prob, "clip_sim": clip_prob,
                "length": output["length"]}
