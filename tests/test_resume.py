"""Full training resume: optimizer/epoch/monitor state round-trip."""

import re

import numpy as np
import pytest

from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def small_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    wav_csv, label_json, _ = make_grounding_data(root, num_audio=6,
                                                 duration=1.0, seed=2)
    vocab = make_vocab(label_json, root / "vocab.pkl")
    loader = {
        "dataset": {"type": "AudioPhraseDataset",
                    "args": {"waveform": str(wav_csv),
                             "label": str(label_json),
                             "time_resolution": 0.04}},
        "collate_fn": {"type": "TextCollate",
                       "args": {"text_key": "phrase",
                                "pad_keys": ["waveform", "label"],
                                "pad_buckets": {"waveform": 32000,
                                                "label": 26},
                                "text_bucket": 4,
                                "tokenizer": {"type": "DictTokenizer",
                                              "args": {"vocabulary": str(
                                                  root / "vocab.pkl")}}}},
        "dataloader_args": {"batch_size": 8},
    }
    return {
        "experiment_path": str(root / "exp"),
        "seed": 1,
        "data": {"train": loader, "val": loader},
        "model": {"type": "BiEncoder",
                  "args": {"shared_dim": 32, "add_proj": True},
                  "audio_encoder": {"type": "Cnn8Rnn",
                                    "args": {"sample_rate": 32000}},
                  "text_encoder": {"type": "EmbeddingAgg",
                                   "args": {"vocab_size": len(vocab),
                                            "embed_dim": 32}},
                  "match_fn": {"type": "DotProduct", "args": {}}},
        "loss": {"type": "FrameBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 2, "early_stop": 10, "save_interval": 1,
                    "max_grad_norm": 1.0, "include_optim_in_ckpt": True,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
    }


def test_full_resume_continues_epochs(small_cfg):
    import copy

    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    cfg = copy.deepcopy(small_cfg)
    runner = StrongRunner()
    exp_dir = runner.train(dict(cfg))

    # resume with more epochs: must start at epoch 3
    cfg2 = copy.deepcopy(small_cfg)
    cfg2["resume"] = str(exp_dir / "last")
    cfg2["trainer"]["epochs"] = 3
    runner2 = StrongRunner()
    runner2.train(dict(cfg2))
    log = (exp_dir / "train.log").read_text()
    assert "resumed from" in log
    epochs_logged = re.findall(r"epoch: (\d+) ", log)
    assert "3" in epochs_logged
    # epochs 1/2 are not re-run after the resume line
    post_resume = log.split("resumed from", 1)[1]
    assert re.search(r"epoch: 1 ", post_resume) is None


def test_finetune_resume_restarts_epochs(small_cfg):
    import copy

    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    cfg = copy.deepcopy(small_cfg)
    exp1 = cfg["experiment_path"]
    cfg["resume"] = str(exp1 + "/best")
    cfg["finetune"] = True
    cfg["experiment_path"] = exp1 + "_ft"
    cfg["trainer"]["epochs"] = 1
    runner = StrongRunner()
    exp_dir = runner.train(dict(cfg))
    log = (exp_dir / "train.log").read_text()
    assert "finetune=True" in log
    assert re.search(r"epoch: 1 ", log)
