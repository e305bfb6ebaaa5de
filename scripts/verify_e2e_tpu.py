"""/verify drive: strong training + eval on the REAL TPU chip, then the
int8 fused-conv serving path parity vs the XLA path on the trained
checkpoint.

Run from /root/repo: python scripts/verify_e2e_tpu.py
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo")

import numpy as np
import yaml


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    from tests.synthetic import make_grounding_data, make_vocab
    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    from pathlib import Path
    root = Path(tempfile.mkdtemp(prefix="verify_e2e_"))
    data_dir = root / "data"
    wav_csv, label_json, dur_csv = make_grounding_data(
        data_dir, num_audio=12, duration=1.0, seed=3,
        event_len=(0.15, 0.3))
    vocab_path = data_dir / "vocab.pkl"
    vocab = make_vocab(label_json, vocab_path)

    def loader_cfg(batch_size=4):
        return {
            "dataset": {"type": "AudioPhraseDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json),
                                 "time_resolution": 0.04}},
            "collate_fn": {
                "type": "TextCollate",
                "args": {"text_key": "phrase",
                         "pad_keys": ["waveform", "label"],
                         "pad_buckets": {"waveform": 32000, "label": 26},
                         "text_bucket": 4,
                         "tokenizer": {"type": "DictTokenizer",
                                       "args": {"vocabulary":
                                                str(vocab_path)}}}},
            "dataloader_args": {"batch_size": batch_size},
        }

    train_config = {
        "experiment_path": str(root / "exp"),
        "seed": 1,
        "data": {"train": loader_cfg(), "val": loader_cfg()},
        "model": {
            "type": "BiEncoder",
            "args": {"shared_dim": 64, "add_proj": True},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
            "text_encoder": {"type": "EmbeddingAgg",
                             "args": {"vocab_size": len(vocab),
                                      "embed_dim": 64}},
            "match_fn": {"type": "ExpNegL2", "args": {}},
        },
        "loss": {"type": "FrameBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 2e-3}},
        "trainer": {"epochs": 15, "early_stop": 15, "save_interval": 10,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
    }
    eval_cfg_path = root / "eval.yaml"
    eval_config = {
        "resume": "best", "n_thresholds": 20, "window_size": 1,
        "max_efprs": [None], "output": "result.txt",
        "data": {"test": {
            "dataset": {"type": "AudioPhraseEvalDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json)}},
            "collate_fn": loader_cfg()["collate_fn"],
            "dataloader_args": {"batch_size": 4},
            "duration": str(dur_csv)}},
    }
    with open(eval_cfg_path, "w") as f:
        yaml.safe_dump(eval_config, f)

    runner = StrongRunner()
    exp_dir = runner.train(dict(train_config))
    log_text = (exp_dir / "train.log").read_text()
    losses = [float(m) for m in re.findall(r"train_loss: ([\d.e+-]+)",
                                           log_text)]
    print(f"train_loss first={losses[0]:.4f} last={losses[-1]:.4f}")
    assert losses[-1] < losses[0], "loss did not decrease"

    results = StrongRunner().evaluate(exp_dir, str(eval_cfg_path))
    rand = StrongRunner().evaluate_random(str(eval_cfg_path))
    print("eval:", {k: round(v, 4) for k, v in results.items()})
    print("rand floor psds:", round(rand["psds@None"], 4))
    assert results["psds@None"] > rand["psds@None"]

    # metric-level parity of the int8 fused serving mode on the same
    # checkpoint (model_overrides switches the eval model to bf16, the
    # env flag routes blocks 3-4 through the int8 Pallas kernels)
    os.environ["TTG_FUSED_CONV"] = "int8"
    try:
        results_i8 = StrongRunner().evaluate(
            exp_dir, str(eval_cfg_path),
            overrides=["model_overrides.audio_encoder.args.dtype="
                       "bfloat16"])
    finally:
        os.environ["TTG_FUSED_CONV"] = "0"
    print("int8 serving eval:",
          {k: round(v, 4) for k, v in results_i8.items()})
    assert abs(results_i8["psds@None"] - results["psds@None"]) < 0.03

    # --- int8 fused serving path vs XLA on the trained params ---
    from texttoaudiogrounding_tpu.training.train_state import load_checkpoint
    from texttoaudiogrounding_tpu.utils.registry import instantiate

    cfg = yaml.safe_load((exp_dir / "config.yaml").read_text())
    cfg["model"]["audio_encoder"].setdefault("args", {})["dtype"] = (
        jnp.bfloat16)
    model = instantiate(cfg["model"])
    payload, _ = load_checkpoint(exp_dir / "best")
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}

    rng = np.random.default_rng(0)
    batch = {
        "waveform": (rng.normal(size=(4, 32000)) * 0.1).astype(np.float32),
        "waveform_len": np.full((4,), 32000, np.int32),
        "text": rng.integers(1, len(vocab), size=(4, 4)).astype(np.int32),
        "text_len": np.full((4,), 4, np.int32),
    }
    outs = {}
    for mode in ("0", "int8"):
        os.environ["TTG_FUSED_CONV"] = mode
        out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            variables, batch)
        outs[mode] = np.asarray(out["frame_sim"], np.float32)
    os.environ["TTG_FUSED_CONV"] = "0"
    a, b = outs["0"], outs["int8"]
    print(f"frame_sim range ({a.min():.4f}, {a.max():.4f}); "
          f"int8 max abs delta {np.abs(a - b).max():.5f}, "
          f"mean {np.abs(a - b).mean():.6f}")
    assert np.abs(a - b).max() < 0.05
    print("VERIFY OK")


if __name__ == "__main__":
    main()
