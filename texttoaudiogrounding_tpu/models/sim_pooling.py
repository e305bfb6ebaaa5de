"""Sim-matrix poolings: reduce ``sim [B, B, T, N]`` → ``[B, B]``.

Reference: models/sim_pooling.py:6-204 — 12 audio-axis x text-axis reduction
combos plus 2 multi-text variants.  Implemented here as one parameterized
module; each reference class name is registered as a preconfigured factory
so YAML configs keep working verbatim.

Layout convention (as in the reference): dim 0 indexes the *audio* item,
dim 1 the *text* item; ``audio_len[i]`` applies along dim 2 and
``text_len[j]`` along dim 3.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops import masking
from texttoaudiogrounding_tpu.utils.registry import register

_AUDIO_POOLS = {
    "mean": masking.mean_with_lens,
    "max": masking.max_with_lens,
    "linear_softmax": masking.linear_softmax_with_lens,
    "exp_softmax": masking.exp_softmax_with_lens,
}
_TEXT_POOLS = {
    "mean": masking.mean_with_lens,
    "sum": masking.sum_with_lens,
    "max": masking.max_with_lens,
}


class SimPooling(nn.Module):
    """Pool the audio axis then the text axis of ``[B, B, T, N]``."""

    audio_pool: str = "mean"
    text_pool: str = "mean"   # or "mean+sum" for the MeanSum variant

    def __call__(self, input_dict: dict) -> jax.Array:
        sim = input_dict["sim"]
        b_a, b_t, t_len, n_len = sim.shape
        audio_len = jnp.asarray(input_dict["audio_len"])
        text_len = jnp.asarray(input_dict["text_len"])

        flat = sim.reshape(b_a * b_t, t_len, n_len)
        a_lens = jnp.repeat(audio_len, b_t)            # audio i per row block
        flat = _AUDIO_POOLS[self.audio_pool](flat, a_lens)   # [B*B, N]
        t_lens = jnp.tile(text_len, b_a)               # text j cycling
        if self.text_pool == "mean+sum":
            out = (masking.sum_with_lens(flat, t_lens)
                   + masking.mean_with_lens(flat, t_lens))
        else:
            out = _TEXT_POOLS[self.text_pool](flat, t_lens)
        return out.reshape(b_a, b_t)


def _make(name: str, audio_pool: str, text_pool: str):
    @register(name)
    def factory(**kwargs):
        return SimPooling(audio_pool=audio_pool, text_pool=text_pool,
                          **kwargs)
    factory.__name__ = name
    return factory


# reference models/sim_pooling.py:6-189
_make("AudioMeanTextMean", "mean", "mean")
_make("AudioMeanTextSum", "mean", "sum")
_make("AudioMaxTextMean", "max", "mean")
_make("AudioMaxTextMax", "max", "max")
_make("AudioMaxTextSum", "max", "sum")
_make("AudioMaxTextMeanSum", "max", "mean+sum")
_make("AudioLinearSoftTextMean", "linear_softmax", "mean")
_make("AudioLinearSoftTextSum", "linear_softmax", "sum")
_make("AudioExpSoftTextMean", "exp_softmax", "mean")
_make("AudioExpSoftTextSum", "exp_softmax", "sum")


class MultiTextPooling(nn.Module):
    """``sim [B, T, N]`` → ``[B, N]`` over the audio axis (reference
    models/sim_pooling.py:192-204)."""

    pool: str = "linear_softmax"

    def __call__(self, input_dict: dict) -> jax.Array:
        sim = input_dict["sim"]  # [B, T, N]
        return _AUDIO_POOLS[self.pool](sim,
                                       jnp.asarray(input_dict["audio_len"]))


@register("MultiTextLinearSoft")
def multi_text_linear_soft(**kwargs):
    return MultiTextPooling(pool="linear_softmax", **kwargs)


@register("MultiTextMax")
def multi_text_max(**kwargs):
    return MultiTextPooling(pool="max", **kwargs)
