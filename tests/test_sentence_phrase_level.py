"""Phrase-level sentence runner (AudioTextAlignByPhrase +
VarNumTextCollate) and zero-shot DESED scoring through a predictor."""

import json

import numpy as np
import pytest
import yaml

import jax

from tests.synthetic import make_grounding_data, make_vocab


def test_align_by_phrase_training(tmp_path_factory):
    from texttoaudiogrounding_tpu.training.runner_weak_sentence import \
        WeakSentenceRunner

    root = tmp_path_factory.mktemp("sent_phrase")
    wav_csv, label_json, dur_csv = make_grounding_data(
        root, num_audio=8, duration=1.0, seed=4)
    vocab = make_vocab(label_json, root / "vocab.pkl")
    tok = {"type": "DictTokenizer",
           "args": {"vocabulary": str(root / "vocab.pkl")}}
    loader = {
        # caption phrases (dict format) → variable N per sample
        "dataset": {"type": "AudioCaptionPhrasesDataset",
                    "args": {"waveform": str(wav_csv),
                             "label": str(label_json),
                             "max_phrase_words": 10}},
        "collate_fn": {"type": "VarNumTextCollate",
                       "args": {"text_key": "phrases",
                                "pad_keys": ["waveform"],
                                "pad_buckets": {"waveform": 32000},
                                "text_bucket": 4, "tokenizer": tok}},
        "dataloader_args": {"batch_size": 8},
    }
    cfg = {
        "experiment_path": str(root / "exp"),
        "seed": 1,
        "data": {"train": loader, "val": loader},
        "model": {
            "type": "AudioTextAlignByPhrase",
            "args": {"shared_dim": 64, "add_proj": True},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
            "text_encoder": {"type": "EmbeddingAgg",
                             "args": {"vocab_size": len(vocab),
                                      "embed_dim": 64}},
            "match_fn": {"type": "AlignDotProduct", "args": {}},
            "sim_pooling": {"type": "AudioLinearSoftTextMean", "args": {}},
        },
        "loss": {"type": "InfoNceLoss", "args": {"tau": 0.1}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 1, "early_stop": 3, "save_interval": 1,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
        "inference_args": {"time_resolution": 0.04},
    }
    runner = WeakSentenceRunner()
    exp_dir = runner.train(dict(cfg))
    assert (exp_dir / "best").exists()
    log = (exp_dir / "train.log").read_text()
    assert "epoch: 1" in log


def test_zero_shot_desed_scoring(tmp_path_factory, rng):
    """score_clips_zero_shot over a real (untrained) MultiText predictor."""
    from texttoaudiogrounding_tpu.evaluation.desed import (
        DESED_CLASSES,
        evaluate_desed_macro_f1,
        evaluate_desed_psds,
        score_clips_zero_shot,
    )
    from texttoaudiogrounding_tpu.inference import GroundingPredictor
    from texttoaudiogrounding_tpu.training.train_state import (
        TrainState,
        save_checkpoint,
    )
    from texttoaudiogrounding_tpu.utils.registry import instantiate

    root = tmp_path_factory.mktemp("desed")
    _, label_json, _ = make_grounding_data(root / "data", num_audio=2,
                                           duration=1.0)
    vocab = make_vocab(label_json, root / "data" / "vocab.pkl")
    config = {
        "data": {"train": {
            "dataset": {"args": {"time_resolution": 0.04}},
            "collate_fn": {"type": "TextCollate", "args": {
                "tokenizer": {"type": "DictTokenizer",
                              "args": {"vocabulary": str(
                                  root / "data" / "vocab.pkl")}}}},
        }},
        "model": {
            "type": "MultiTextBiEncoder",
            "args": {"shared_dim": 32, "add_proj": True,
                     "text_forward_keys": ["text", "text_len"]},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
            "text_encoder": {"type": "EmbeddingAgg",
                             "args": {"vocab_size": len(vocab),
                                      "embed_dim": 32}},
            "match_fn": {"type": "DotProduct", "args": {}},
        },
    }
    exp_dir = root / "exp"
    exp_dir.mkdir()
    yaml.safe_dump(config, open(exp_dir / "config.yaml", "w"))
    model = instantiate(config["model"])
    batch = {"waveform": np.zeros((1, 32000), np.float32),
             "waveform_len": np.array([32000]),
             "text": np.zeros((1, 1, 4), np.int32),
             "text_len": np.array([[4]])}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    save_checkpoint(exp_dir / "best",
                    TrainState(params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               opt_state=None, step=0),
                    1, {}, 0, include_optim=False)

    predictor = GroundingPredictor.from_experiment(str(exp_dir))
    clips = {"c0": rng.normal(size=32000).astype(np.float32) * 0.1,
             "c1": rng.normal(size=32000).astype(np.float32) * 0.1}
    scores = score_clips_zero_shot(predictor, clips, time_resolution=0.04)
    assert set(scores) == {"c0", "c1"}
    df = scores["c0"]
    assert all(c in df.columns for c in DESED_CLASSES)
    gt = {"c0": [(0.1, 0.5, "Dog")], "c1": [(0.2, 0.6, "Cat")]}
    durations = {"c0": 1.0, "c1": 1.0}
    psds = evaluate_desed_psds(scores, gt, durations, num_thresholds=10)
    f1 = evaluate_desed_macro_f1(scores, gt, durations,
                                 time_resolution=0.04)
    assert np.isfinite([psds["psds1"], psds["psds2"],
                        f1["macro_f1"]]).all()
