"""Batch align functions: all-pairs audio-frame x text-item similarity.

Contract (reference models/align.py): ``audio [B, T, D]`` x ``text
[B, N, D]`` → ``sim [B(audio), B(text), T, N]`` for retrieval-style
training.  The reference's ExpNegL2 is a python double loop
(models/align.py:58-63); here both are single einsums.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.match import l2_normalize
from texttoaudiogrounding_tpu.utils.registry import register

_EPS = 1e-12


@register("AlignDotProduct")
class AlignDotProduct(nn.Module):
    """Sigmoid dot product over all (audio i, text j) pairs.

    Reference: models/align.py:7-31.
    """

    l2norm: bool = False
    scaled: bool = False

    def __call__(self, audio: jax.Array, text: jax.Array,
                 **kwargs) -> jax.Array:
        if self.l2norm:
            audio = l2_normalize(audio)
            text = l2_normalize(text)
        score = jnp.einsum("itd,jnd->ijtn", audio, text)
        if self.scaled:
            score = score / math.sqrt(audio.shape[-1])
        return jnp.clip(jax.nn.sigmoid(score), 1e-7, 1.0)


@register("AlignExpNegL2")
class AlignExpNegL2(nn.Module):
    """``exp(-||a_i,t - t_j,n||)`` over all pairs (L2-normalized inputs).

    Reference: models/align.py:34-64 (loop-based there; closed-form here).
    """

    def __call__(self, audio: jax.Array, text: jax.Array,
                 **kwargs) -> jax.Array:
        audio = l2_normalize(audio)
        text = l2_normalize(text)
        a2 = jnp.sum(audio * audio, axis=-1)   # [B, T]
        t2 = jnp.sum(text * text, axis=-1)     # [B, N]
        at = jnp.einsum("itd,jnd->ijtn", audio, text)
        d2 = jnp.maximum(a2[:, None, :, None] + t2[None, :, None, :]
                         - 2.0 * at, 0.0)
        return jnp.exp(-jnp.sqrt(d2 + _EPS))
