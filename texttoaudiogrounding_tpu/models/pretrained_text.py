"""Pretrained-style transformer text towers, implemented natively in flax.

Covers the reference's HF-wrapped encoders (models/text_encoder.py:271-327):
``Bert`` ([CLS] pooling), ``SentenceBert`` (mean pooling), and
``LaionClapEncoder`` (RoBERTa tower + linear projection + L2 norm — the text
side of laion/clap-htsat-fused).  Instead of wrapping torch modules, the
tower is a standard post-LN BERT encoder in flax; weights are imported from
local HF torch checkpoints via ``import_hf_bert_params`` (zero-egress
environment: files must already be on disk).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.models.match import l2_normalize
from texttoaudiogrounding_tpu.utils.registry import register


@dataclasses.dataclass(frozen=True)
class TextTowerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    pad_token_id: int = 0
    # RoBERTa offsets position ids by pad_token_id + 1
    position_offset: int = 0


def tiny_text_tower_config(vocab_size: int = 100) -> TextTowerConfig:
    """Small config for tests."""
    return TextTowerConfig(vocab_size=vocab_size, hidden_size=32,
                           num_layers=2, num_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, type_vocab_size=2)


class TransformerLayer(nn.Module):
    cfg: TextTowerConfig

    @nn.compact
    def __call__(self, x, mask, *, train: bool):
        cfg = self.cfg
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dropout_rate=cfg.dropout,
            deterministic=not train, name="attention")(
                x, x, x, mask=mask[:, None, None, :])
        attn = nn.Dropout(cfg.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="attention_norm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output")(h)
        h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_norm")(x + h)


class TextTower(nn.Module):
    """BERT/RoBERTa-style encoder → (last_hidden [B, L, H], pooled [B, H])."""

    cfg: TextTowerConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, *,
                 train: bool = False):
        cfg = self.cfg
        input_ids = jnp.asarray(input_ids).astype(jnp.int32)
        mask = jnp.asarray(attention_mask).astype(bool)
        positions = jnp.arange(input_ids.shape[1])[None] \
            + cfg.position_offset
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                     name="word_embeddings")(input_ids)
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         name="position_embeddings")(positions)
        if cfg.type_vocab_size:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                             name="token_type_embeddings")(
                jnp.asarray(token_type_ids).astype(jnp.int32))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="embeddings_norm")(x)
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        for i in range(cfg.num_layers):
            x = TransformerLayer(cfg, name=f"layer_{i}")(x, mask,
                                                         train=train)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, name="pooler")(x[:, 0]))
        return x, pooled


@register("Bert")
class Bert(nn.Module):
    """[CLS]-pooling BERT text encoder (reference
    models/text_encoder.py:271-293).  Expects tokenized inputs
    (``input_ids``/``attention_mask``/optional ``token_type_ids``)."""

    cfg: TextTowerConfig

    @property
    def embed_dim(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        hidden, _pooled = TextTower(self.cfg, name="tower")(
            input_dict["input_ids"], input_dict["attention_mask"],
            input_dict.get("token_type_ids"), train=train)
        return {"seq_emb": hidden[:, 0], "token_emb": hidden,
                "attention_mask": input_dict["attention_mask"]}


@register("SentenceBert")
class SentenceBert(nn.Module):
    """Mean-pooling sentence encoder (reference
    models/text_encoder.py:296-308 wraps sentence-transformers, whose
    standard pooling is the attention-masked token mean)."""

    cfg: TextTowerConfig

    @property
    def embed_dim(self) -> int:
        return self.cfg.hidden_size

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        hidden, _ = TextTower(self.cfg, name="tower")(
            input_dict["input_ids"], input_dict["attention_mask"],
            input_dict.get("token_type_ids"), train=train)
        mask = jnp.asarray(input_dict["attention_mask"])[..., None]
        mask = mask.astype(hidden.dtype)
        seq_emb = (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-9)
        return {"seq_emb": seq_emb, "token_emb": hidden}


@register("LaionClapEncoder")
@register("ClapTextEncoder")
class ClapTextEncoder(nn.Module):
    """CLAP text tower: RoBERTa + 2-layer projection + L2 norm.

    Reference: models/text_encoder.py:311-327 (and the HF deployment copy,
    models/hf_modeling_grounding.py:183-199).  HF ClapProjectionLayer is
    ``Linear → GELU... actually ReLU → Linear``; the pooled output is
    projected and L2-normalized, token embeddings are projected only.
    """

    cfg: TextTowerConfig
    projection_dim: int = 512

    @property
    def embed_dim(self) -> int:
        return self.projection_dim

    @nn.compact
    def __call__(self, input_dict: dict, *, train: bool = False) -> dict:
        hidden, pooled = TextTower(self.cfg, name="tower")(
            input_dict["input_ids"], input_dict["attention_mask"],
            input_dict.get("token_type_ids"), train=train)

        proj_hidden = nn.Dense(self.projection_dim, name="proj_hidden")
        proj_out = nn.Dense(self.projection_dim, name="proj_out")

        def project(x):
            return proj_out(nn.relu(proj_hidden(x)))

        token_emb = project(hidden)
        seq_emb = l2_normalize(project(pooled))
        return {"seq_emb": seq_emb, "token_emb": token_emb}


# --------------------------------------------------------------------------
# HF torch checkpoint import


def config_from_hf(hf_config) -> TextTowerConfig:
    """Map a transformers Bert/Roberta config onto TextTowerConfig."""
    is_roberta = getattr(hf_config, "model_type", "bert") == "roberta"
    return TextTowerConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=getattr(hf_config, "type_vocab_size", 0),
        layer_norm_eps=hf_config.layer_norm_eps,
        dropout=hf_config.hidden_dropout_prob,
        pad_token_id=getattr(hf_config, "pad_token_id", 0) or 0,
        position_offset=(hf_config.pad_token_id + 1) if is_roberta else 0,
    )


def _split_heads(w: np.ndarray) -> np.ndarray:
    return w


def import_hf_bert_params(state_dict: dict, cfg: TextTowerConfig,
                          prefix: str = "") -> dict:
    """Convert a torch BERT/RoBERTa state dict into TextTower params.

    ``state_dict``: name → numpy array (torch tensors accepted).  ``prefix``
    strips a leading module path (e.g. ``"text_model."`` inside a CLAP
    checkpoint, ``"bert."``/``"roberta."`` in MLM checkpoints).
    """

    def get(name):
        value = state_dict[prefix + name]
        if hasattr(value, "numpy"):
            value = value.detach().cpu().numpy()
        return np.asarray(value)

    h = cfg.hidden_size
    nh = cfg.num_heads
    params: dict = {
        "word_embeddings": {"embedding": get("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": get("embeddings.position_embeddings.weight")},
        "embeddings_norm": {"scale": get("embeddings.LayerNorm.weight"),
                            "bias": get("embeddings.LayerNorm.bias")},
    }
    if cfg.type_vocab_size:
        params["token_type_embeddings"] = {
            "embedding": get("embeddings.token_type_embeddings.weight")}
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}."
        attn = {}
        for ours, theirs in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value")):
            attn[ours] = {
                "kernel": get(lp + theirs + ".weight").T.reshape(
                    h, nh, h // nh),
                "bias": get(lp + theirs + ".bias").reshape(nh, h // nh),
            }
        attn["out"] = {
            "kernel": get(lp + "attention.output.dense.weight").T.reshape(
                nh, h // nh, h),
            "bias": get(lp + "attention.output.dense.bias"),
        }
        params[f"layer_{i}"] = {
            "attention": attn,
            "attention_norm": {
                "scale": get(lp + "attention.output.LayerNorm.weight"),
                "bias": get(lp + "attention.output.LayerNorm.bias")},
            "intermediate": {
                "kernel": get(lp + "intermediate.dense.weight").T,
                "bias": get(lp + "intermediate.dense.bias")},
            "output": {"kernel": get(lp + "output.dense.weight").T,
                       "bias": get(lp + "output.dense.bias")},
            "output_norm": {"scale": get(lp + "output.LayerNorm.weight"),
                            "bias": get(lp + "output.LayerNorm.bias")},
        }
    if prefix + "pooler.dense.weight" in state_dict:
        params["pooler"] = {"kernel": get("pooler.dense.weight").T,
                            "bias": get("pooler.dense.bias")}
    else:
        params["pooler"] = {"kernel": np.eye(h, dtype=np.float32),
                            "bias": np.zeros(h, np.float32)}
    return jax.tree.map(jnp.asarray, params)


def import_clap_text_params(state_dict: dict,
                            cfg: TextTowerConfig) -> dict:
    """Build ClapTextEncoder params from a HF ClapModel state dict
    (``text_model.*`` + ``text_projection.*``)."""

    def get(name):
        value = state_dict[name]
        if hasattr(value, "numpy"):
            value = value.detach().cpu().numpy()
        return np.asarray(value)

    tower = import_hf_bert_params(state_dict, cfg, prefix="text_model.")
    proj_hidden = {
        "kernel": get("text_projection.linear1.weight").T,
        "bias": get("text_projection.linear1.bias")}
    proj_out = {
        "kernel": get("text_projection.linear2.weight").T,
        "bias": get("text_projection.linear2.bias")}
    return {"tower": tower,
            "proj_hidden": jax.tree.map(jnp.asarray, proj_hidden),
            "proj_out": jax.tree.map(jnp.asarray, proj_out)}
