"""Sentence-level WSTAG + class-mapping runner E2E (small, CPU mesh)."""

import json
import pickle

import numpy as np
import pytest
import yaml

from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    root = tmp_path_factory.mktemp("sent_e2e")
    wav_csv, label_json, dur_csv = make_grounding_data(
        root, num_audio=8, duration=1.0, seed=9)
    vocab = make_vocab(label_json, root / "vocab.pkl")
    tok = {"type": "DictTokenizer",
           "args": {"vocabulary": str(root / "vocab.pkl")}}
    return {"root": root, "wav_csv": wav_csv, "label": label_json,
            "dur": dur_csv, "vocab": vocab, "tok": tok}


def test_weak_sentence_by_word(base):
    from texttoaudiogrounding_tpu.training.runner_weak_sentence import \
        WeakSentenceRunner

    tok = base["tok"]
    loader = {
        "dataset": {"type": "AudioCaptionDataset",
                    "args": {"waveform": str(base["wav_csv"]),
                             "label": str(base["label"]),
                             "max_audio_length": 1.0}},
        "collate_fn": {"type": "TextCollate",
                       "args": {"text_key": "caption",
                                "pad_keys": ["waveform"],
                                "pad_buckets": {"waveform": 32000},
                                "text_bucket": 4, "tokenizer": tok}},
        "dataloader_args": {"batch_size": 8},
    }
    cfg = {
        "experiment_path": str(base["root"] / "exp_sentence"),
        "seed": 1,
        "data": {"train": loader, "val": loader},
        "model": {
            "type": "AudioTextAlignByWord",
            "args": {"shared_dim": 64, "add_proj": True},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
            "text_encoder": {"type": "EmbeddingAgg",
                             "args": {"vocab_size": len(base["vocab"]),
                                      "embed_dim": 64}},
            "match_fn": {"type": "AlignDotProduct", "args": {}},
            "sim_pooling": {"type": "AudioMaxTextMean", "args": {}},
        },
        "loss": {"type": "MaxTripletLoss", "args": {"margin": 0.5}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 1, "early_stop": 3, "save_interval": 1,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
        "inference_args": {"time_resolution": 0.04,
                           "word_aggregation": "max", "window_size": 1},
    }
    runner = WeakSentenceRunner()
    exp_dir = runner.train(dict(cfg))
    assert (exp_dir / "best").exists()

    # eval: single-phrase items, diagonal of the sim matrix
    eval_cfg = {
        "resume": "best", "n_thresholds": 10, "window_size": 1,
        "time_resolution": 0.04, "max_efprs": [None],
        "output": "result.txt",
        "data": {"test": {
            "dataset": {"type": "AudioPhraseEvalDataset",
                        "args": {"waveform": str(base["wav_csv"]),
                                 "label": str(base["label"])}},
            "collate_fn": {"type": "TextCollate",
                           "args": {"text_key": "phrase",
                                    "pad_keys": ["waveform"],
                                    "pad_buckets": {"waveform": 32000},
                                    "text_bucket": 4, "tokenizer": tok}},
            "dataloader_args": {"batch_size": 8},
            "duration": str(base["dur"]),
        }},
    }
    eval_path = base["root"] / "eval_sentence.yaml"
    yaml.safe_dump(eval_cfg, open(eval_path, "w"))
    results = WeakSentenceRunner().evaluate(exp_dir, str(eval_path))
    assert np.isfinite(list(results.values())).all()


def test_class_mapping_weak_runner(base, tmp_path_factory):
    from texttoaudiogrounding_tpu.training.runner_class_mapping import \
        ClassMappingWeakRunner

    tmp = tmp_path_factory.mktemp("cm")
    label = json.load(open(base["label"]))
    phrases = sorted({p["phrase"] for it in label for p in it["phrases"]})
    rng = np.random.default_rng(0)
    cmap = {i: phrases[i::2] for i in range(2)}
    json.dump(cmap, open(tmp / "cmap.json", "w"))

    loader = {
        "dataset": {"type": "SpectralMappingDataset",
                    "args": {"waveform": str(base["wav_csv"]),
                             "label": str(base["label"]),
                             "cluster_map": str(tmp / "cmap.json"),
                             "label_type": "weak"}},
        "collate_fn": {"type": "VarLenPadCollate",
                       "args": {"pad_keys": ["waveform"],
                                "pad_buckets": {"waveform": 32000}}},
        "dataloader_args": {"batch_size": 8},
    }
    cfg = {
        "experiment_path": str(tmp / "exp_cm"),
        "seed": 1,
        "mixup": True,
        "specaug": True,
        "data": {"train": loader, "val": loader},
        "model": {
            "type": "AudioTagging",
            "args": {"classes_num": 2, "pooling": "linear_softmax"},
            "audio_encoder": {"type": "Cnn8Rnn",
                              "args": {"sample_rate": 32000}},
        },
        "loss": {"type": "ClipBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 1, "early_stop": 3, "save_interval": 1,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
    }
    runner = ClassMappingWeakRunner()
    exp_dir = runner.train(dict(cfg))
    assert (exp_dir / "best").exists()

    eval_cfg = {"resume": "best", "output": "tagging.tsv"}
    eval_path = tmp / "eval_cm.yaml"
    yaml.safe_dump(eval_cfg, open(eval_path, "w"))
    result = ClassMappingWeakRunner().evaluate_tagging(exp_dir,
                                                      str(eval_path))
    assert len(result) == 2
    assert np.isfinite(result["ap"]).all()
