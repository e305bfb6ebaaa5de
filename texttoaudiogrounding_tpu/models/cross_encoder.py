"""Cross-encoder fusion modules (audio queries over text KV + mutual gating).

Reference: models/cross_encoder.py:5-79.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.masking import generate_length_mask
from texttoaudiogrounding_tpu.utils.registry import register


class Seq2SeqAttention(nn.Module):
    """Additive (Bahdanau) attention of query frames over kv tokens.

    Reference: models/cross_encoder.py:5-42.  The reference materializes the
    [bs, q_len*kv_len, d_q+d_kv] concat; here the tanh(W[q;k]) factorizes as
    tanh(W_q q + W_k k) computed separately and broadcast-added — same math,
    no quadratic concat tensor.
    """

    d_attn: int

    @nn.compact
    def __call__(self, query: jax.Array, kv: jax.Array,
                 query_len: jax.Array, kv_len: jax.Array) -> jax.Array:
        # split weight matrix: h2attn([q;k]) == Wq q + Wk k + b
        q_part = nn.Dense(self.d_attn, name="h2attn_q")(query)  # [B,Tq,A]
        k_part = nn.Dense(self.d_attn, use_bias=False,
                          name="h2attn_k")(kv)                  # [B,Tk,A]
        hidden = jnp.tanh(q_part[:, :, None, :] + k_part[:, None, :, :])
        v = self.param("v", nn.initializers.normal(1.0), (self.d_attn,))
        score = jnp.einsum("bqka,a->bqk", hidden, v)
        qmask = generate_length_mask(jnp.asarray(query_len), query.shape[1])
        kmask = generate_length_mask(jnp.asarray(kv_len), kv.shape[1])
        score = jnp.where(qmask[:, :, None], score, -1e10)
        score = jnp.where(kmask[:, None, :], score, -1e10)
        attn = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", attn, kv)


class CrossGating(nn.Module):
    """Mutual sigmoid gating (reference models/cross_encoder.py:45-57)."""

    @nn.compact
    def __call__(self, u: jax.Array, s: jax.Array):
        g_u = jax.nn.sigmoid(nn.Dense(u.shape[-1], name="fc_u")(u))
        s_out = s * g_u
        g_s = jax.nn.sigmoid(nn.Dense(s.shape[-1], name="fc_s")(s))
        u_out = u * g_s
        return u_out, s_out


@register("CrossAttentionGating")
class CrossAttentionGating(nn.Module):
    """Seq2seq attention + mutual gating (reference
    models/cross_encoder.py:60-79)."""

    embed_dim: int

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        audio_emb = input_dict["audio_emb"]
        text_emb = input_dict["text_emb"]
        if isinstance(text_emb, dict):
            text_emb = text_emb["token_emb"]
        attended = Seq2SeqAttention(self.embed_dim, name="attn")(
            audio_emb, text_emb,
            input_dict["audio_len"], input_dict["text_len"])
        audio_out, text_out = CrossGating(name="gating")(audio_emb, attended)
        return {"audio_emb": audio_out, "text_emb": {"token_emb": text_out}}
