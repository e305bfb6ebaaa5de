"""End-to-end strong training slice on synthetic data, on the 8-device CPU
mesh: config → data → model → jitted DP train step → checkpoint → eval
decode → PSDS/th-AUC beating the random floor."""

import numpy as np
import pytest
import yaml

from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def configs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data"
    wav_csv, label_json, dur_csv = make_grounding_data(
        data_dir, num_audio=12, duration=1.0, seed=3,
        event_len=(0.15, 0.3))
    vocab_path = data_dir / "vocab.pkl"
    vocab = make_vocab(label_json, vocab_path)

    def loader_cfg(batch_size=4):
        return {
            "dataset": {
                "type": "AudioPhraseDataset",
                "args": {"waveform": str(wav_csv), "label": str(label_json),
                         "time_resolution": 0.04},
            },
            "collate_fn": {
                "type": "TextCollate",
                "args": {"text_key": "phrase",
                         "pad_keys": ["waveform", "label"],
                         "pad_buckets": {"waveform": 32000, "label": 26},
                         "text_bucket": 4,
                         "tokenizer": {"type": "DictTokenizer",
                                       "args": {"vocabulary":
                                                str(vocab_path)}}},
            },
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
    test_cfg = {
        "dataset": {"type": "AudioPhraseEvalDataset",
                    "args": {"waveform": str(wav_csv),
                             "label": str(label_json)}},
        "collate_fn": loader_cfg()["collate_fn"],
        "dataloader_args": {"batch_size": 4},
        "duration": str(dur_csv),
    }
    eval_config = {"resume": "best", "n_thresholds": 20, "window_size": 1,
                   "max_efprs": [None], "output": "result.txt",
                   "data": {"test": test_cfg}}
    with open(eval_cfg_path, "w") as f:
        yaml.safe_dump(eval_config, f)
    return {"train": train_config, "eval": str(eval_cfg_path),
            "root": root}


def test_train_eval_end_to_end(configs):
    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    runner = StrongRunner()
    exp_dir = runner.train(dict(configs["train"]))
    assert (exp_dir / "best").exists()
    assert (exp_dir / "config.yaml").exists()
    log_text = (exp_dir / "train.log").read_text()
    assert "epoch: 1" in log_text and "epoch: 15" in log_text
    # loss must decrease over training
    import re
    losses = [float(m) for m in re.findall(r"train_loss: ([\d.e+-]+)",
                                           log_text)]
    assert losses[-1] < losses[0]

    results = StrongRunner().evaluate(exp_dir, configs["eval"])
    assert "psds@None" in results and "th_auc@0.0-1.0" in results
    assert np.isfinite(list(results.values())).all()
    assert (exp_dir / "result.txt").exists()
    assert (exp_dir / "predictions").exists()

    # random floor: the trained model must beat random predictions on
    # PSDS.  (th_auc is not a sound floor on this fixture: uniform random
    # scores reach high F1 at low thresholds because the synthetic events
    # cover much of each clip, so only finiteness is pinned for it.)
    rand = StrongRunner().evaluate_random(configs["eval"])
    assert np.isfinite(rand["th_auc@0.0-1.0"])
    assert results["psds@None"] > rand["psds@None"], (results, rand)


def test_debug_command(configs):
    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner
    runner = StrongRunner()
    state = runner.debug(dict(configs["train"]), iters=2)
    assert int(state.step) == 2
