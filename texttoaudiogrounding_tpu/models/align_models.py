"""Sentence-level alignment/retrieval models: all-pairs sim matrices pooled
to ``sim [B, B]`` for ranking losses.

Reference: models/audio_text_model.py:843-1073.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.audio_text_model import _text_out_dim
from texttoaudiogrounding_tpu.utils.registry import register


@register("AudioTextAlignByWord")
class AudioTextAlignByWord(nn.Module):
    """Word-wise alignment: audio frames x caption tokens → ``[B, B, T, L]``
    → sim pooling → ``[B, B]``.

    Reference: models/audio_text_model.py:843-904 (``match_fn`` here is an
    align fn with signature (audio, text)).
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    sim_pooling: nn.Module
    shared_dim: int = 512
    add_proj: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False

    def _needs_proj(self) -> bool:
        return (self.audio_encoder.embed_dim
                != _text_out_dim(self.text_encoder)) or self.add_proj

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        audio_emb = audio_output["embedding"]
        word_emb = self.text_encoder(input_dict, train=train)["token_emb"]
        if self._needs_proj():
            audio_emb = nn.Dense(self.shared_dim, name="audio_proj")(
                audio_emb)
            word_emb = nn.Dense(self.shared_dim, name="text_proj")(word_emb)
        sim_matrix = self.match_fn(audio_emb, word_emb)
        sim = self.sim_pooling({
            "sim": sim_matrix,
            "audio_len": audio_output["length"],
            "text_len": input_dict["text_len"],
        })
        output = {"sim": sim}
        if input_dict.get("output_matrix", False):
            output["sim_matrix"] = sim_matrix
        return output


def _pack_phrases(flat_emb: jax.Array, pad_index: jax.Array,
                  nums: jax.Array) -> jax.Array:
    """[sumN, D] flat phrase embeddings → [B, maxN, D] padded, using the
    host-built gather map (collate ``{key}_pad_index``); padded rows are
    zeroed (matching the reference's pad_sequence zeros,
    models/audio_text_model.py:956-957)."""
    packed = flat_emb[pad_index]                      # [B, maxN, D]
    mask = (jnp.arange(pad_index.shape[1])[None, :]
            < nums[:, None])[..., None]
    return packed * mask.astype(packed.dtype)


@register("AudioTextAlignByPhrase")
class AudioTextAlignByPhrase(nn.Module):
    """Phrase-wise alignment over a variable number of phrases per caption.

    Reference: models/audio_text_model.py:907-976.  The ragged
    ``torch.split`` + ``pad_sequence`` re-pack is a static gather via the
    collate-provided ``{text_key}_pad_index``.
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    sim_pooling: nn.Module
    shared_dim: int = 512
    cross_encoder: Optional[nn.Module] = None
    add_proj: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False
    text_key: str = "phrases"

    def _needs_proj(self) -> bool:
        return (self.audio_encoder.embed_dim
                != _text_out_dim(self.text_encoder)) or self.add_proj

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        audio_emb = audio_output["embedding"]
        text_key = input_dict.get("text_key", self.text_key)
        phrases_emb = self.text_encoder({
            "text": input_dict[text_key],
            "text_len": input_dict[f"{text_key}_len"],
        }, train=train)
        nums = jnp.asarray(input_dict[f"{text_key}_num"])
        seq_emb = _pack_phrases(phrases_emb["seq_emb"],
                                jnp.asarray(
                                    input_dict[f"{text_key}_pad_index"]),
                                nums)
        if self._needs_proj():
            audio_emb = nn.Dense(self.shared_dim, name="audio_proj")(
                audio_emb)
            seq_emb = nn.Dense(self.shared_dim, name="text_proj")(seq_emb)
        sim_matrix = self.match_fn(audio_emb, seq_emb)
        sim = self.sim_pooling({
            "sim": sim_matrix,
            "audio_len": audio_output["length"],
            "text_len": nums,
        })
        output = {"sim": sim}
        if input_dict.get("output_matrix", False):
            output["sim_matrix"] = sim_matrix
        return output


@register("AudioTextCrossAlignByPhrase")
class AudioTextCrossAlignByPhrase(nn.Module):
    """Cross-encoder variant: every (audio i, phrase) pair is fused through
    the cross encoder before scoring.

    Reference: models/audio_text_model.py:979-1073 (a per-sample Python
    loop there; a ``lax.map`` over the audio axis here — compiled once).
    """

    audio_encoder: nn.Module
    text_encoder: nn.Module
    match_fn: nn.Module
    sim_pooling: nn.Module
    cross_encoder: nn.Module
    shared_dim: int = 512
    add_proj: bool = False
    freeze_audio_encoder: bool = False
    freeze_text_encoder: bool = False
    text_key: str = "phrases"

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_output = self.audio_encoder(input_dict, train=train)
        audio_emb = audio_output["embedding"]       # [B, T, D]
        audio_len = audio_output["length"]
        text_key = input_dict.get("text_key", self.text_key)
        phrases_emb = self.text_encoder({
            "text": input_dict[text_key],
            "text_len": input_dict[f"{text_key}_len"],
        }, train=train)
        token_emb = phrases_emb["token_emb"]        # [sumN, L, D]
        text_len = jnp.asarray(input_dict[f"{text_key}_len"])
        nums = jnp.asarray(input_dict[f"{text_key}_num"])
        pad_index = jnp.asarray(input_dict[f"{text_key}_pad_index"])
        sum_n = token_emb.shape[0]

        # all (audio i, phrase) pairs in one flat batch — the reference's
        # python loop (:1041-1063) becomes a single cross-encoder call
        b, t, d = audio_emb.shape
        audio_b = jnp.broadcast_to(audio_emb[:, None],
                                   (b, sum_n, t, d)).reshape(-1, t, d)
        audio_len_b = jnp.repeat(audio_len, sum_n)
        token_b = jnp.broadcast_to(token_emb[None],
                                   (b,) + token_emb.shape).reshape(
                                       -1, *token_emb.shape[1:])
        text_len_b = jnp.tile(text_len, b)
        forward = {
            "audio_emb": audio_b,
            "text_emb": {"token_emb": token_b},
            "audio_len": audio_len_b,
            "text_len": text_len_b,
        }
        forward.update(self.cross_encoder(forward, train=train))
        sim_flat = self.match_fn(forward, train=train)  # [B*sumN, T]
        sim_flat = sim_flat.reshape(b, sum_n, -1)
        # sim_flat: [B, sumN, T] → pack the phrase axis → [B, B, T, maxN]
        packed = sim_flat[:, pad_index, :]           # [B, B, maxN, T]
        mask = (jnp.arange(pad_index.shape[1])[None, :, None]
                < nums[:, None, None])
        packed = packed * mask[None].astype(packed.dtype)
        sim_matrix = jnp.swapaxes(packed, 2, 3)      # [B, B, T, maxN]

        sim = self.sim_pooling({
            "sim": sim_matrix,
            "audio_len": audio_len,
            "text_len": nums,
        })
        return {"sim": sim, "sim_matrix": sim_matrix}
