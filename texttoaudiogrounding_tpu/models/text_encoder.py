"""Text encoders: token ids → ``{"seq_emb": [B, D], "token_emb": [B, L, D]}``.

Covers the reference zoo (models/text_encoder.py): word-embedding mean /
attention pooling (the WSTAG primary "w2vmean"), RNN encoder, intra-attention
(ConvGRU message passing), single-block MHA with CLS token, and a native
transformer tower used for BERT/CLAP-style pretrained text encoders (weights
imported from HF checkpoints rather than wrapping torch modules).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.models.layers import (GRU, LSTM, RNN,
                                                    PositionalEncoding)
from texttoaudiogrounding_tpu.ops.masking import (
    generate_length_mask,
    masked_softmax,
    mean_with_lens,
)
from texttoaudiogrounding_tpu.utils.registry import register


class EmbeddingLayer(nn.Module):
    """Token embedding, optionally initialized from a word2vec ``.npy``.

    Reference: models/text_encoder.py:14-43.  ``freeze_embedding`` is
    honored by the optimizer mask (training.optim), mirroring
    ``nn.Embedding.from_pretrained(freeze=True)``.
    """

    vocab_size: int
    embed_dim: int
    pretrained_embedding: Optional[str] = None
    freeze_embedding: bool = False

    def setup(self):
        if self.pretrained_embedding is not None:
            weight = np.load(self.pretrained_embedding)
            if weight.shape != (self.vocab_size, self.embed_dim):
                raise ValueError(
                    f"expect embedding with shape "
                    f"{(self.vocab_size, self.embed_dim)} "
                    f"but {weight.shape} is given")
            init = lambda *_: jnp.asarray(weight, dtype=jnp.float32)
        else:
            # kaiming-uniform equivalent of the reference init_weights
            init = nn.initializers.variance_scaling(
                1 / 3, "fan_in", "uniform")
        self.embed = nn.Embed(self.vocab_size, self.embed_dim,
                              embedding_init=init)

    def __call__(self, input_dict: dict) -> jax.Array:
        return self.embed(jnp.asarray(input_dict["text"]).astype(jnp.int32))


class AttentionPooling(nn.Module):
    """Learned scalar-score pooling (reference models/text_encoder.py:46-58)."""

    @nn.compact
    def __call__(self, x: jax.Array, lens: jax.Array) -> jax.Array:
        score = nn.Dense(1)(x)[..., 0]                     # [B, L]
        mask = generate_length_mask(lens, x.shape[1])
        weight = masked_softmax(score, mask, axis=1)
        return jnp.sum(x * weight[..., None], axis=1)


@register("EmbeddingAgg")
class EmbeddingAgg(nn.Module):
    """Word embeddings + mean/attention pooling ("w2vmean"), the primary
    WSTAG text encoder.  Reference: models/text_encoder.py:61-88."""

    vocab_size: int
    embed_dim: int
    pretrained_embedding: Optional[str] = None
    freeze_embedding: bool = False
    aggregation: str = "mean"

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        embs = EmbeddingLayer(self.vocab_size, self.embed_dim,
                              self.pretrained_embedding,
                              self.freeze_embedding,
                              name="embedding")(input_dict)
        lens = jnp.asarray(input_dict["text_len"])
        if self.aggregation == "mean":
            out = mean_with_lens(embs, lens)
        elif self.aggregation == "attention":
            out = AttentionPooling(name="attn")(embs, lens)
        else:
            raise ValueError(f"{self.aggregation} not supported")
        return {"token_emb": embs, "seq_emb": out}


@register("RnnEncoder")
class RnnEncoder(nn.Module):
    """Embedding → RNN → mean pooling (reference models/text_encoder.py:91-125)."""

    vocab_size: int
    embed_dim: int
    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    rnn_type: str = "GRU"
    pooling: str = "mean"

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        x = EmbeddingLayer(self.vocab_size, self.embed_dim,
                           name="embedding")(input_dict)
        if self.rnn_type == "GRU":
            token_emb = GRU(self.hidden_dim, self.num_layers,
                            self.bidirectional, name="rnn")(x)
        elif self.rnn_type == "RNN":
            # vanilla Elman RNN — reference getattr(nn, rnn_type)
            # accepts it (models/text_encoder.py:106); routing it to a
            # GRU would silently train a different architecture
            token_emb = RNN(self.hidden_dim, self.num_layers,
                            self.bidirectional, name="rnn")(x)
        elif self.rnn_type == "LSTM":
            token_emb = LSTM(self.hidden_dim, self.num_layers,
                             self.bidirectional, name="rnn")(x)
        else:
            raise ValueError(f"bad rnn_type {self.rnn_type}")
        lens = jnp.asarray(input_dict["text_len"])
        seq_emb = mean_with_lens(token_emb, lens)
        return {"token_emb": token_emb, "seq_emb": seq_emb}

    @property
    def out_dim(self) -> int:
        return self.hidden_dim * (2 if self.bidirectional else 1)


class ConvGRUCell(nn.Module):
    """Graph-update GRU cell applied position-wise over token features.

    Reference: models/text_encoder.py:147-188 (kernel_size=1 case — the
    gates are Dense layers over concatenated [input, state]).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, inputs: jax.Array, state: jax.Array) -> jax.Array:
        ortho = nn.initializers.orthogonal()
        stacked = jnp.concatenate([inputs, state], axis=-1)
        update = nn.sigmoid(nn.Dense(self.hidden_size, kernel_init=ortho,
                                     name="update_gate")(stacked))
        reset = nn.sigmoid(nn.Dense(self.hidden_size, kernel_init=ortho,
                                    name="reset_gate")(stacked))
        out = nn.tanh(nn.Dense(
            self.hidden_size, kernel_init=ortho, name="out_gate")(
                jnp.concatenate([inputs, state * reset], axis=-1)))
        return state * (1 - update) + out * update


@register("IntraAttention")
class IntraAttention(nn.Module):
    """Self-attention message passing with a ConvGRU update.

    Reference: models/text_encoder.py:191-237.  Note the reference masks
    invalid score entries with the *value* 1e-10 (not -inf) before softmax;
    replicated for parity.
    """

    vocab_size: int
    embed_dim: int
    num_layers: int = 1
    pooling: str = "mean"

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        x = EmbeddingLayer(self.vocab_size, self.embed_dim,
                           name="embedding")(input_dict)
        lens = jnp.asarray(input_dict["text_len"])
        max_len = x.shape[1]
        pe = PositionalEncoding(0.2, name="pe")
        cell = ConvGRUCell(self.embed_dim, name="conv_gru")
        mask1 = generate_length_mask(lens, max_len)  # [B, L]
        pair_mask = mask1[:, None, :] & mask1[:, :, None]
        for _ in range(self.num_layers):
            # the reference calls pe(x) TWICE (models/text_encoder.py:
            # 214-216): two independent dropout draws per layer — one
            # shared draw would correlate the operands and inflate the
            # score diagonal in training
            px = pe(x, train=train)
            qx = pe(x, train=train)
            score = jnp.einsum("bld,bmd->blm", px, qx)
            score = jnp.where(pair_mask, score, 1e-10)
            attn = jax.nn.softmax(score, axis=2)
            message = jnp.einsum("blm,bmd->bld", attn, x)
            x = cell(message, x)
        seq_emb = mean_with_lens(x, lens)
        return {"token_emb": x, "seq_emb": seq_emb}


@register("SelfAttention")
class SelfAttention(nn.Module):
    """Single MHA block with a CLS token (reference
    models/text_encoder.py:240-268): seq_emb = CLS output."""

    vocab_size: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.2
    pretrained_embedding: Optional[str] = None
    freeze_embedding: bool = False

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        x = EmbeddingLayer(self.vocab_size, self.embed_dim,
                           self.pretrained_embedding, self.freeze_embedding,
                           name="embedding")(input_dict)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.tile(cls, (x.shape[0], 1, 1)), x], axis=1)
        x = PositionalEncoding(self.dropout, name="pe")(x, train=train)
        lens = jnp.asarray(input_dict["text_len"]) + 1
        mask = generate_length_mask(lens, x.shape[1])  # [B, L+1] True=valid
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="mha")(x, x, x, mask=mask[:, None, None, :])
        return {"token_emb": x[:, 1:], "seq_emb": x[:, 0]}
