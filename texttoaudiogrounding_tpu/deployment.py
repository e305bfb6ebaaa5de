"""Standalone deployment artifacts: export a trained experiment into a
self-contained directory and load it back without the experiment tree.

Reference parity: the reference publishes its model as a
``trust_remote_code`` HF artifact — a self-contained config + weights
package whose forward is ``model(audio, audio_len, text) -> frame
probabilities`` (models/hf_modeling_grounding.py:305-352).  The native
equivalent here is a directory::

    deploy_dir/
      deploy.json     # model spec + tokenizer spec + inference params
      weights.npz     # flat param/batch-stat arrays (no orbax tree)
      vocabulary.pkl  # (DictTokenizer only) the vocabulary payload
      model.pth       # reference-format torch checkpoint (model families
                      # with a torch name map — see torch_import.py)

which :func:`predictor_from_deployment` reconstructs (as a
``GroundingPredictor``) with zero references to the training experiment
(configs, checkpoints, data paths).  The import direction (HF torch
checkpoint -> native) lives in training/torch_import.py.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def export_deployment(experiment_path: str, output_dir: str,
                      which: str = "best") -> Path:
    """Pack a trained experiment into a standalone deployment dir."""
    from texttoaudiogrounding_tpu.inference import GroundingPredictor
    from texttoaudiogrounding_tpu.utils.config import \
        parse_config_or_kwargs

    exp_dir = Path(experiment_path)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    config = parse_config_or_kwargs(exp_dir / "config.yaml")

    # resolve the checkpoint through the predictor loader (handles
    # trainable-only checkpoints by merging over a fresh init)
    predictor = GroundingPredictor.from_experiment(experiment_path,
                                                   which=which)
    flat = {}
    for collection, tree in predictor.variables.items():
        flat.update(_flatten(tree, collection))
    np.savez_compressed(out / "weights.npz", **flat)

    tok_cfg = config["data"]["train"]["collate_fn"]["args"]["tokenizer"]
    tok_cfg = json.loads(json.dumps(tok_cfg))  # deep copy, plain types
    vocab = tok_cfg.get("args", {}).get("vocabulary")
    if vocab:
        shutil.copy(vocab, out / "vocabulary.pkl")
        tok_cfg["args"]["vocabulary"] = "vocabulary.pkl"

    # additionally publish a reference-format torch checkpoint when the
    # model family has a torch name map (Cnn8Rnn/EmbeddingAgg BiEncoders;
    # pretrained text towers ship their own torch checkpoints)
    torch_ckpt = None
    try:
        from texttoaudiogrounding_tpu.training.torch_import import (
            export_biencoder,
            save_torch_checkpoint,
        )
        sd = export_biencoder(predictor.variables)
        save_torch_checkpoint(out / "model.pth", sd)
        torch_ckpt = "model.pth"
    except (ValueError, KeyError):
        pass

    # ... and, for the same families, a hub-publishable AutoModel
    # artifact (modeling_grounding.py + config.json + pytorch_model.bin)
    hf_files = None
    if torch_ckpt is not None:
        try:
            export_hf_artifact(config, predictor, sd, out)
            hf_files = ["modeling_grounding.py", "config.json",
                        "pytorch_model.bin"]
        except (ValueError, KeyError):
            pass

    deploy = {
        "model": config["model"],
        "torch_checkpoint": torch_ckpt,
        "hf_artifact": hf_files,
        "tokenizer": tok_cfg,
        "time_resolution": predictor.time_resolution,
        "audio_bucket": predictor.audio_bucket,
        "text_bucket": predictor.text_bucket,
        "batch_buckets": list(predictor.batch_buckets),
        "sample_rate": config["model"].get("audio_encoder", {})
                             .get("args", {}).get("sample_rate", 32000),
    }
    with open(out / "deploy.json", "w") as f:
        json.dump(deploy, f, indent=2)
    return out


def export_hf_artifact(config: dict, predictor, torch_sd: dict,
                       out: Path) -> None:
    """Emit the ``trust_remote_code`` AutoModel artifact next to the
    native deployment files: ``modeling_grounding.py`` (copied from
    ``hf_artifact/``), ``config.json`` with the ``auto_map`` hooks, and
    ``pytorch_model.bin`` holding the reference-format state dict under
    the wrapper's ``model.`` prefix.  The result loads with
    ``AutoModel.from_pretrained(dir, trust_remote_code=True)`` — the
    reference's release mechanism (hf_modeling_grounding.py:305-352).

    Supports the torch-exportable family: BiEncoder(Cnn8Rnn,
    EmbeddingAgg, DotProduct/ExpNegL2) with a DictTokenizer vocabulary.
    Raises ``ValueError`` for anything else.
    """
    import torch

    mcfg = config["model"]
    if mcfg.get("type") not in ("BiEncoder",):
        raise ValueError(f"HF artifact supports BiEncoder; "
                         f"got {mcfg.get('type')}")
    if mcfg["audio_encoder"]["type"] not in ("Cnn8Rnn", "Cnn8_Rnn"):
        raise ValueError("HF artifact supports Cnn8Rnn audio encoders")
    text_cfg = mcfg["text_encoder"]
    if text_cfg["type"] != "EmbeddingAgg":
        raise ValueError("HF artifact supports EmbeddingAgg text encoders")
    match_cfg = mcfg["match_fn"]
    match_type = match_cfg["type"].replace("Match", "")
    if match_type not in ("DotProduct", "ExpNegL2"):
        raise ValueError(f"no HF artifact match fn for {match_cfg['type']}")

    vocab = getattr(getattr(predictor.tokenizer, "vocabulary", None),
                    "word2idx", None)
    if vocab is None:
        raise ValueError("HF artifact needs a DictTokenizer vocabulary")

    hf_config = {
        "model_type": "text_audio_grounding",
        "architectures": ["GroundingModel"],
        "auto_map": {
            "AutoConfig": "modeling_grounding.GroundingConfig",
            "AutoModel": "modeling_grounding.GroundingModel",
        },
        "sample_rate": mcfg["audio_encoder"].get("args", {}).get(
            "sample_rate", 32000),
        "shared_dim": mcfg.get("args", {}).get("shared_dim", 512),
        "add_proj": mcfg.get("args", {}).get("add_proj", False),
        "upsample": mcfg.get("args", {}).get("upsample", False),
        "audio_encoder": {"type": "Cnn8Rnn"},
        "text_encoder": {
            "type": "EmbeddingAgg",
            "vocab_size": text_cfg["args"]["vocab_size"],
            "embed_dim": text_cfg["args"]["embed_dim"],
            "aggregation": text_cfg["args"].get("aggregation", "mean"),
        },
        "match_fn": {"type": match_type,
                     **{k: v for k, v in match_cfg.get("args", {}).items()
                        if k in ("l2norm", "scale", "text_level")}},
        "vocab": vocab,
        "torch_dtype": "float32",
    }
    with open(out / "config.json", "w") as f:
        json.dump(hf_config, f, indent=2)
    shutil.copy(Path(__file__).parent / "hf_artifact"
                / "modeling_grounding.py", out / "modeling_grounding.py")
    tensors = {f"model.{k}": torch.as_tensor(np.array(v))
               for k, v in torch_sd.items()}
    torch.save(tensors, out / "pytorch_model.bin")


def load_deployment(deploy_dir: str):
    """Rebuild (model, variables, tokenizer, meta) from a deployment
    directory — no experiment tree, no checkpoint machinery."""
    from texttoaudiogrounding_tpu.utils.registry import instantiate

    root = Path(deploy_dir)
    deploy = json.load(open(root / "deploy.json"))
    model = instantiate(deploy["model"])
    with np.load(root / "weights.npz") as z:
        flat = {k: z[k] for k in z.files}
    variables = _unflatten(flat)

    tok_cfg = json.loads(json.dumps(deploy["tokenizer"]))
    vocab = tok_cfg.get("args", {}).get("vocabulary")
    if vocab and not Path(vocab).is_absolute():
        tok_cfg["args"]["vocabulary"] = str(root / vocab)
    tokenizer = instantiate(tok_cfg)
    return model, variables, tokenizer, deploy


def predictor_from_deployment(deploy_dir: str):
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    model, variables, tokenizer, deploy = load_deployment(deploy_dir)
    return GroundingPredictor(
        model, variables, tokenizer,
        time_resolution=deploy.get("time_resolution", 0.04),
        audio_bucket=deploy.get("audio_bucket", 32000),
        text_bucket=deploy.get("text_bucket", 4),
        # artifacts written before batch bucketing existed keep their
        # original exact-size behavior (no silent padding on upgrade);
        # new exports always carry the field explicitly
        batch_buckets=tuple(deploy.get("batch_buckets", ())))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment_path")
    ap.add_argument("output_dir")
    ap.add_argument("--which", default="best")
    args = ap.parse_args(argv)
    out = export_deployment(args.experiment_path, args.output_dir,
                            args.which)
    print(f"exported deployment -> {out}")


if __name__ == "__main__":
    main()
