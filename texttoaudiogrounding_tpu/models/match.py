"""Frame-vs-text match functions: per-frame similarity scores.

Contract (reference models/match.py:10-88): given ``audio_emb [P, T, D]``
and a text dict (``seq_emb [P, D]`` / ``token_emb [P, L, D]``), return
``frame_sim [P, T]`` in (0, 1].

TPU addition: ``pairwise`` methods compute ``[B, N, T]`` scores for one
audio against N phrases *without* materializing the ``[B*N, T, D]`` audio
broadcast the reference chunks with ``safe_size``
(models/audio_text_model.py:188-207) — einsum keeps it on the MXU.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.masking import generate_length_mask
from texttoaudiogrounding_tpu.utils.registry import register

_EPS = 1e-12


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, _EPS)


@register("MatchExpNegL2")
@register("ExpNegL2")
class ExpNegL2(nn.Module):
    """``exp(-||a - t||)`` (optionally L2-normalized inputs).

    Reference: models/match.py:10-33.
    """

    l2norm: bool = True
    text_level: str = "seq"

    def _text(self, text_emb):
        if isinstance(text_emb, dict):
            return text_emb["seq_emb" if self.text_level == "seq"
                            else "token_emb"]
        return text_emb

    def __call__(self, input_dict: dict, *, train: bool = False) -> jax.Array:
        audio = input_dict["audio_emb"]            # [P, T, D]
        text = self._text(input_dict["text_emb"])  # [P, D] or [P, T, D]
        if self.l2norm:
            audio = l2_normalize(audio)
            text = l2_normalize(text)
        if text.ndim == 2:
            text = text[:, None, :]
        diff = audio - text
        return jnp.exp(-jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS))

    def pairwise(self, audio: jax.Array, text: jax.Array) -> jax.Array:
        """audio [B, T, D] x text [B, N, D] → [B, N, T], no broadcast blowup:
        ||a-t||^2 = |a|^2 + |t|^2 - 2 a.t."""
        if self.l2norm:
            audio = l2_normalize(audio)
            text = l2_normalize(text)
        a2 = jnp.sum(audio * audio, axis=-1)       # [B, T]
        t2 = jnp.sum(text * text, axis=-1)         # [B, N]
        at = jnp.einsum("btd,bnd->bnt", audio, text)
        d2 = jnp.maximum(a2[:, None, :] + t2[:, :, None] - 2.0 * at, 0.0)
        return jnp.exp(-jnp.sqrt(d2 + _EPS))


@register("MatchDotProduct")
@register("DotProduct")
class DotProduct(nn.Module):
    """Scaled sigmoid dot product, clamped to [1e-7, 1].

    Reference: models/match.py:36-60 (the HF deployment match fn,
    hf_modeling_grounding.py:209-226).
    """

    l2norm: bool = False
    scale: bool = True
    text_level: str = "seq"

    def _score(self, raw: jax.Array, dim: int) -> jax.Array:
        if self.scale:
            raw = raw / math.sqrt(dim)
        return jnp.clip(jax.nn.sigmoid(raw), 1e-7, 1.0)

    def __call__(self, input_dict: dict, *, train: bool = False) -> jax.Array:
        audio = input_dict["audio_emb"]
        text = input_dict["text_emb"]
        if isinstance(text, dict):
            text = text["seq_emb" if self.text_level == "seq"
                        else "token_emb"]
        if self.l2norm:
            audio = l2_normalize(audio)
            text = l2_normalize(text)
        if text.ndim == 2:
            text = text[:, None, :]
        raw = jnp.sum(audio * text, axis=-1)
        return self._score(raw, audio.shape[-1])

    def pairwise(self, audio: jax.Array, text: jax.Array) -> jax.Array:
        """audio [B, T, D] x text [B, N, D] → [B, N, T] via einsum."""
        if self.l2norm:
            audio = l2_normalize(audio)
            text = l2_normalize(text)
        raw = jnp.einsum("btd,bnd->bnt", audio, text)
        return self._score(raw, audio.shape[-1])


@register("MatchCrossAttention")
@register("CrossAttention")
class CrossAttention(nn.Module):
    """Residual cross-attention scorer: audio queries attend to text tokens,
    then LN + linear + sigmoid per frame.

    Reference: models/match.py:63-88.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> jax.Array:
        audio = input_dict["audio_emb"]                 # [P, T, D]
        text = input_dict["text_emb"]["token_emb"]      # [P, L, D']
        text_len = jnp.asarray(input_dict["text_len"])
        mask = generate_length_mask(text_len, text.shape[1])
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="attn")(audio, text, text, mask=mask[:, None, None, :])
        out = audio + nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.LayerNorm(name="norm")(out)
        out = nn.Dense(1, name="linear")(out)[..., 0]
        return jax.nn.sigmoid(out)
