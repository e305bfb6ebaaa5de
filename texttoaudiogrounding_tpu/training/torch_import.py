"""Import PyTorch checkpoints (reference ``.pth`` / HF deployment weights)
into the flax parameter trees — and export flax-trained models back to
reference-format torch state dicts (``export_cnn8rnn`` /
``export_biencoder`` / ``save_torch_checkpoint``), so models trained here
are publishable into the reference ecosystem.

Covers the bit-parity contract of SURVEY §7: reference-trained Cnn8Rnn /
BiEncoder / MultiTextBiEncoder weights (and the HF grounding model,
models/hf_modeling_grounding.py) load into this framework.  Handles the
layout differences: conv ``[Cout, Cin, kH, kW] → [kH, kW, Cin, Cout]``,
dense transpose, BatchNorm weight→scale + running stats→batch_stats, and
the torch↔flax GRU gate mapping (torch stacks ``W_ir|W_iz|W_in`` with two
bias vectors; flax GRUCell has per-gate Dense modules where ``hr``/``hz``
carry no bias, so ``b_ir + b_hr`` folds into the input-gate bias — the
recurrences are then algebraically identical).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _np(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` checkpoint to numpy (unwraps the reference's
    ``{"model": state_dict}`` container, run_strong.py:679-690)."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and \
            not hasattr(state["model"], "detach"):
        state = state["model"]
    return {k: _np(v) for k, v in state.items()}


def _conv(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, name):
    params = {"scale": _np(sd[f"{name}.weight"]),
              "bias": _np(sd[f"{name}.bias"])}
    stats = {"mean": _np(sd[f"{name}.running_mean"]),
             "var": _np(sd[f"{name}.running_var"])}
    return params, stats


def _dense(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _gru_cell(sd, prefix: str, suffix: str = "") -> dict:
    """One torch GRU direction → flax GRUCell params."""
    w_ih = _np(sd[f"{prefix}.weight_ih_l0{suffix}"])   # [3H, In]
    w_hh = _np(sd[f"{prefix}.weight_hh_l0{suffix}"])   # [3H, H]
    b_ih = _np(sd[f"{prefix}.bias_ih_l0{suffix}"])
    b_hh = _np(sd[f"{prefix}.bias_hh_l0{suffix}"])
    h = w_hh.shape[1]
    w_ir, w_iz, w_in = w_ih[:h], w_ih[h:2 * h], w_ih[2 * h:]
    w_hr, w_hz, w_hn = w_hh[:h], w_hh[h:2 * h], w_hh[2 * h:]
    b_ir, b_iz, b_in = b_ih[:h], b_ih[h:2 * h], b_ih[2 * h:]
    b_hr, b_hz, b_hn = b_hh[:h], b_hh[h:2 * h], b_hh[2 * h:]
    return {
        "ir": {"kernel": w_ir.T, "bias": b_ir + b_hr},
        "iz": {"kernel": w_iz.T, "bias": b_iz + b_hz},
        "in": {"kernel": w_in.T, "bias": b_in},
        "hr": {"kernel": w_hr.T},
        "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T, "bias": b_hn},
    }


def import_bigru(sd, prefix: str) -> dict:
    """torch ``nn.GRU(bidirectional=True)`` → our BiGRU params.

    ``nn.RNN`` is scope-transparent in flax, so the cells live directly in
    the BiGRU scope as ``GRUCell_0`` (forward) / ``GRUCell_1`` (backward).
    """
    return {
        "GRUCell_0": _gru_cell(sd, prefix),
        "GRUCell_1": _gru_cell(sd, prefix, "_reverse"),
    }


def import_cnn8rnn(sd: Dict[str, np.ndarray],
                   prefix: str = "") -> dict:
    """torch Cnn8Rnn state dict → ``{"params", "batch_stats"}`` variables.

    Name map follows reference models/audio_encoder.py:89-232.
    """
    def g(name):
        return f"{prefix}{name}"

    params: dict = {}
    stats: dict = {}
    params["bn0"], stats["bn0"] = _bn(sd, g("bn0"))
    for i in range(1, 5):
        block = f"conv_block{i}"
        bp: dict = {}
        bs: dict = {}
        bp["conv1"] = _conv(sd, g(f"{block}.conv1"))
        bp["conv2"] = _conv(sd, g(f"{block}.conv2"))
        bp["bn1"], bs["bn1"] = _bn(sd, g(f"{block}.bn1"))
        bp["bn2"], bs["bn2"] = _bn(sd, g(f"{block}.bn2"))
        params[block] = bp
        stats[block] = bs
    params["fc1"] = _dense(sd, g("fc1"))
    params["rnn"] = import_bigru(sd, g("rnn"))
    return {"params": params, "batch_stats": stats}


def import_embedding_agg(sd: Dict[str, np.ndarray],
                         prefix: str = "") -> dict:
    """torch EmbeddingAgg → params (reference models/text_encoder.py:61-88;
    the table lives at ``embedding.core.weight``)."""
    params = {"embedding": {"embed": {
        "embedding": _np(sd[f"{prefix}embedding.core.weight"])}}}
    if f"{prefix}attn.fc.weight" in sd:
        params["attn"] = {"Dense_0": _dense(sd, f"{prefix}attn.fc")}
    return params


def import_biencoder(sd: Dict[str, np.ndarray],
                     text_encoder: str = "embedding_agg") -> dict:
    """torch BiEncoder / MultiTextBiEncoder (Cnn8Rnn + EmbeddingAgg [+
    projections]) → variables for our corresponding model."""
    audio = import_cnn8rnn(sd, prefix="audio_encoder.")
    params = {"audio_encoder": audio["params"]}
    batch_stats = {"audio_encoder": audio["batch_stats"]}
    if text_encoder == "embedding_agg":
        params["text_encoder"] = import_embedding_agg(
            sd, prefix="text_encoder.")
    if "audio_proj.weight" in sd:
        params["audio_proj"] = _dense(sd, "audio_proj")
    if "text_proj.weight" in sd:
        params["text_proj"] = _dense(sd, "text_proj")
    return {"params": params, "batch_stats": batch_stats}


def import_hf_grounding(sd: Dict[str, np.ndarray],
                        text_cfg) -> dict:
    """HF deployment checkpoint (reference models/hf_modeling_grounding.py:
    305-352 — Cnn8Rnn + CLAP text tower + projections + DotProduct) →
    variables for BiEncoder(Cnn8Rnn, ClapTextEncoder, DotProduct)."""
    from texttoaudiogrounding_tpu.models.pretrained_text import \
        import_hf_bert_params

    audio = import_cnn8rnn(sd, prefix="audio_encoder.")
    tower = import_hf_bert_params(sd, text_cfg,
                                  prefix="text_encoder.model.")
    params = {
        "audio_encoder": audio["params"],
        "text_encoder": {
            "tower": tower,
            "proj_hidden": _dense(sd, "text_encoder.projection.linear1"),
            "proj_out": _dense(sd, "text_encoder.projection.linear2"),
        },
        "audio_proj": _dense(sd, "audio_proj"),
        "text_proj": _dense(sd, "text_proj"),
    }
    return {"params": params,
            "batch_stats": {"audio_encoder": audio["batch_stats"]}}


def _conv_out(params) -> Dict[str, np.ndarray]:
    # flax [kH, kW, Cin, Cout] -> torch [Cout, Cin, kH, kW]
    return {"weight": np.asarray(params["kernel"]).transpose(3, 2, 0, 1)}


def _bn_out(params, stats) -> Dict[str, np.ndarray]:
    return {"weight": np.asarray(params["scale"]),
            "bias": np.asarray(params["bias"]),
            "running_mean": np.asarray(stats["mean"]),
            "running_var": np.asarray(stats["var"]),
            "num_batches_tracked": np.asarray(0, np.int64)}


def _dense_out(params) -> Dict[str, np.ndarray]:
    out = {"weight": np.asarray(params["kernel"]).T}
    if "bias" in params:
        out["bias"] = np.asarray(params["bias"])
    return out


def _gru_cell_out(cell: dict, prefix: str, suffix: str = ""
                  ) -> Dict[str, np.ndarray]:
    """flax GRUCell params → one torch GRU direction.

    Inverse of :func:`_gru_cell`.  The flax cell has no ``hr``/``hz``
    biases (they were folded into the input-gate biases on import), so the
    exported split puts the whole r/z bias on ``bias_ih`` and zeros on
    ``bias_hh`` — algebraically identical torch recurrence, and
    export→import round-trips bit-exactly.
    """
    def k(name):
        return np.asarray(cell[name]["kernel"]).T

    h = k("hr").shape[1]
    zeros = np.zeros(h, k("hr").dtype)
    return {
        f"{prefix}.weight_ih_l0{suffix}":
            np.concatenate([k("ir"), k("iz"), k("in")], axis=0),
        f"{prefix}.weight_hh_l0{suffix}":
            np.concatenate([k("hr"), k("hz"), k("hn")], axis=0),
        f"{prefix}.bias_ih_l0{suffix}": np.concatenate(
            [np.asarray(cell["ir"]["bias"]),
             np.asarray(cell["iz"]["bias"]),
             np.asarray(cell["in"]["bias"])]),
        f"{prefix}.bias_hh_l0{suffix}": np.concatenate(
            [zeros, zeros, np.asarray(cell["hn"]["bias"])]),
    }


def export_bigru(params: dict, prefix: str) -> Dict[str, np.ndarray]:
    """Our BiGRU params → torch ``nn.GRU(bidirectional=True)`` keys."""
    out = _gru_cell_out(params["GRUCell_0"], prefix)
    out.update(_gru_cell_out(params["GRUCell_1"], prefix, "_reverse"))
    return out


def export_cnn8rnn(variables: dict, prefix: str = ""
                   ) -> Dict[str, np.ndarray]:
    """flax Cnn8Rnn variables → reference torch state dict (inverse of
    :func:`import_cnn8rnn`; name map models/audio_encoder.py:89-232)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def put(name, tensors):
        for suffix, value in tensors.items():
            sd[f"{prefix}{name}.{suffix}"] = value

    put("bn0", _bn_out(params["bn0"], stats["bn0"]))
    for i in range(1, 5):
        block = f"conv_block{i}"
        put(f"{block}.conv1", _conv_out(params[block]["conv1"]))
        put(f"{block}.conv2", _conv_out(params[block]["conv2"]))
        put(f"{block}.bn1", _bn_out(params[block]["bn1"],
                                    stats[block]["bn1"]))
        put(f"{block}.bn2", _bn_out(params[block]["bn2"],
                                    stats[block]["bn2"]))
    put("fc1", _dense_out(params["fc1"]))
    sd.update(export_bigru(params["rnn"], f"{prefix}rnn"))
    return sd


def export_embedding_agg(params: dict, prefix: str = ""
                         ) -> Dict[str, np.ndarray]:
    """flax EmbeddingAgg params → reference torch keys (inverse of
    :func:`import_embedding_agg`; models/text_encoder.py:61-88)."""
    sd = {f"{prefix}embedding.core.weight":
          np.asarray(params["embedding"]["embed"]["embedding"])}
    if "attn" in params:
        for key, value in _dense_out(params["attn"]["Dense_0"]).items():
            sd[f"{prefix}attn.fc.{key}"] = value
    return sd


def export_biencoder(variables: dict) -> Dict[str, np.ndarray]:
    """flax BiEncoder / MultiTextBiEncoder variables → reference torch
    state dict (inverse of :func:`import_biencoder`).

    Covers the trained-model families of the TAG task: Cnn8Rnn audio
    tower, EmbeddingAgg text tower, and the shared-space projections.
    Raises ``ValueError`` for text towers with no torch name map (the
    pretrained BERT/CLAP towers ship their own torch checkpoints).
    """
    params = variables["params"]
    sd = export_cnn8rnn(
        {"params": params["audio_encoder"],
         "batch_stats": variables["batch_stats"]["audio_encoder"]},
        prefix="audio_encoder.")
    if "text_encoder" in params:
        text = params["text_encoder"]
        if set(text) - {"embedding", "attn"}:
            raise ValueError(
                "torch export supports EmbeddingAgg text encoders; got "
                f"modules {sorted(text)}")
        sd.update(export_embedding_agg(text, prefix="text_encoder."))
    for proj in ("audio_proj", "text_proj"):
        if proj in params:
            for key, value in _dense_out(params[proj]).items():
                sd[f"{proj}.{key}"] = value
    return sd


def save_torch_checkpoint(path, state_dict: Dict[str, np.ndarray]) -> None:
    """Write a reference-format ``.pth`` (``{"model": state_dict}``
    container, run_strong.py:679-690) loadable by ``torch.load``."""
    import torch
    tensors = {k: torch.as_tensor(np.array(v))  # copy: torch needs writable
               for k, v in state_dict.items()}
    torch.save({"model": tensors}, str(path))


def merge_into_variables(variables: dict, imported: dict,
                         log_fn=print) -> dict:
    """Shape-matched merge of imported leaves into initialized variables
    (reference merge_matched_keys, utils/train_util.py:219-248): leaves
    present in both with matching shapes are replaced; the rest kept."""
    flat_var = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat_imp = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(imported)[0]}
    mismatched = []
    for key, value in flat_imp.items():
        if key in flat_var and flat_var[key].shape == np.shape(value):
            flat_var[key] = jnp.asarray(value)
        else:
            mismatched.append(key)
    if mismatched:
        log_fn(f"import: skipped mismatched keys {mismatched}")
    treedef = jax.tree_util.tree_structure(variables)
    paths = [jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(variables)[0]]
    return jax.tree_util.tree_unflatten(treedef,
                                        [flat_var[p] for p in paths])
