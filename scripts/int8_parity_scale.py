"""int8 serving parity at realistic scale (round-2 verdict item 4).

Trains a checkpoint to convergence on 120 synthetic clips x 10 s with
varied event density (1-4 events per clip, 0.2-2.5 s each), then
evaluates the SAME checkpoint through three serving modes — f32, bf16
(fused Pallas logmel + bf16 trunk) and int8 (fused int8 conv blocks
3-4) — reporting PSDS (max_efpr=None), grounding th-AUC, and the
full-eval frame-probability / 50-threshold decode deltas.

Run from /root/repo on the TPU: python scripts/int8_parity_scale.py
Results table lives in STATUS.md ("int8 serving parity at scale").
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import yaml


def main():
    import jax

    print("backend:", jax.default_backend())
    from tests.synthetic import make_grounding_data, make_vocab
    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    root = Path(tempfile.mkdtemp(prefix="int8_scale_"))
    data_dir = root / "data"
    wav_csv, label_json, dur_csv = make_grounding_data(
        data_dir, num_audio=120, duration=10.0, seed=11, max_phrases=4,
        event_len=(0.2, 2.5))
    vocab_path = data_dir / "vocab.pkl"
    vocab = make_vocab(label_json, vocab_path)

    def loader_cfg(batch_size=16):
        return {
            "dataset": {"type": "AudioPhraseDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json),
                                 "time_resolution": 0.04}},
            "collate_fn": {
                "type": "TextCollate",
                "args": {"text_key": "phrase",
                         "pad_keys": ["waveform", "label"],
                         "pad_buckets": {"waveform": 320000,
                                         "label": 251},
                         "text_bucket": 4,
                         "tokenizer": {"type": "DictTokenizer",
                                       "args": {"vocabulary":
                                                str(vocab_path)}}}},
            "dataloader_args": {"batch_size": batch_size},
        }

    train_config = {
        "experiment_path": str(root / "exp"), "seed": 1,
        "data": {"train": loader_cfg(), "val": loader_cfg()},
        "model": {
            "type": "BiEncoder",
            "args": {"shared_dim": 512, "add_proj": True},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
            "text_encoder": {"type": "EmbeddingAgg",
                             "args": {"vocab_size": len(vocab),
                                      "embed_dim": 512}},
            "match_fn": {"type": "DotProduct", "args": {}},
        },
        "loss": {"type": "FrameBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 25, "early_stop": 25, "save_interval": 10,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
    }
    eval_cfg_path = root / "eval.yaml"
    eval_config = {
        "resume": "best", "n_thresholds": 50, "window_size": 1,
        "max_efprs": [None], "output": "result.txt",
        "data": {"test": {
            "dataset": {"type": "AudioPhraseEvalDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json)}},
            "collate_fn": loader_cfg()["collate_fn"],
            "dataloader_args": {"batch_size": 8},
            "duration": str(dur_csv)}},
    }
    with open(eval_cfg_path, "w") as f:
        yaml.safe_dump(eval_config, f)

    runner = StrongRunner()
    exp_dir = runner.train(dict(train_config))
    log_text = (exp_dir / "train.log").read_text()
    losses = [float(m) for m in re.findall(r"train_loss: ([\d.e+-]+)",
                                           log_text)]
    print(f"train_loss first={losses[0]:.4f} last={losses[-1]:.4f} "
          f"({len(losses)} epochs)")

    modes = {
        "f32": ("0", []),
        "bf16": ("0", ["model_overrides.audio_encoder.args.dtype="
                       "bfloat16"]),
        "int8": ("int8", ["model_overrides.audio_encoder.args.dtype="
                          "bfloat16"]),
    }
    results = {}
    for name, (env, overrides) in modes.items():
        os.environ["TTG_FUSED_CONV"] = env
        try:
            results[name] = StrongRunner().evaluate(
                exp_dir, str(eval_cfg_path), overrides=list(overrides))
        finally:
            os.environ["TTG_FUSED_CONV"] = "0"
        print(f"{name}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in sorted(results[name].items())))

    # frame-probability + per-threshold decode deltas on the full set
    from texttoaudiogrounding_tpu.evaluation.decode import \
        decode_multi_threshold
    from texttoaudiogrounding_tpu.inference import GroundingPredictor
    import h5py

    thresholds = np.arange(1 / 100, 1, 1 / 50)
    probs = {}
    for name, (env, _ov) in modes.items():
        os.environ["TTG_FUSED_CONV"] = env
        try:
            pred = GroundingPredictor.from_experiment(str(exp_dir))
            if name != "f32":
                # rebuild in bf16 serving mode
                cfg = yaml.safe_load((exp_dir / "config.yaml").read_text())
                import jax.numpy as jnp

                from texttoaudiogrounding_tpu.utils.registry import \
                    instantiate
                cfg["model"]["audio_encoder"].setdefault(
                    "args", {})["dtype"] = jnp.bfloat16
                pred.model = instantiate(cfg["model"])
                import jax as _jax
                pred._forward = _jax.jit(
                    lambda v, b: pred.model.apply(v, b, train=False))
            labels = yaml.safe_load(open(label_json)) \
                if str(label_json).endswith(".yaml") else None
            import json
            items = json.load(open(label_json))
            rng_pick = np.random.default_rng(0)
            picks = rng_pick.choice(len(items), size=40, replace=False)
            all_probs = []
            with h5py.File(data_dir / "waveform.h5", "r") as hf:
                for i in picks:
                    item = items[i]
                    wav = hf[item["audio_id"]][()]
                    phrase = item["phrases"][0]["phrase"]
                    p = pred.predict(wav[None], np.array([len(wav)]),
                                     [phrase])
                    all_probs.append(p[0])
            probs[name] = np.stack(all_probs)
        finally:
            os.environ["TTG_FUSED_CONV"] = "0"

    ref = probs["f32"]
    for name in ("bf16", "int8"):
        d = np.abs(probs[name] - ref)
        # decode agreement across the 50-threshold grid
        diffs = 0
        total = 0
        for a, b in zip(ref, probs[name]):
            sa = decode_multi_threshold(a, thresholds, window_size=1,
                                        connect_n=13,
                                        time_resolution=0.04)
            sb = decode_multi_threshold(b, thresholds, window_size=1,
                                        connect_n=13,
                                        time_resolution=0.04)
            for ea, eb in zip(sa, sb):
                total += max(len(ea), len(eb), 1)
                if [tuple(x) for x in ea] != [tuple(x) for x in eb]:
                    diffs += 1
        print(f"{name} vs f32: max|dprob|={d.max():.4f} "
              f"mean={d.mean():.6f}; decode rows differing at any of 50 "
              f"thresholds: {diffs}/{len(ref) * len(thresholds)}")
    print("PARITY RUN COMPLETE")


if __name__ == "__main__":
    main()
