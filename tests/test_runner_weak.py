"""WSTAG phrase-level runner end-to-end on synthetic data (CPU mesh)."""

import json

import numpy as np
import pytest
import yaml

from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def configs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wstag_e2e")
    # WSTAG train data: phrases as plain strings
    train_dir = root / "train"
    wav_fp_csv_dir, train_label, _ = make_grounding_data(
        train_dir, num_audio=8, duration=1.0, seed=5, phrases_as_str=True)
    # grounding-format eval data
    test_dir = root / "test"
    test_wav_csv, test_label, test_dur = make_grounding_data(
        test_dir, num_audio=6, duration=1.0, seed=6)
    vocab_path = root / "vocab.pkl"
    # vocab over both
    items = json.load(open(train_label)) + json.load(open(test_label))
    from texttoaudiogrounding_tpu.data.vocabulary import build_vocab
    vocab = build_vocab(items, vocab_path)

    all_phrases = sorted({p for it in json.load(open(train_label))
                          for p in it["phrases"]})
    cmap_path = root / "clusters.json"
    json.dump({i: all_phrases[i::3] for i in range(3)},
              open(cmap_path, "w"))

    tok = {"type": "DictTokenizer", "args": {"vocabulary": str(vocab_path)}}

    def wstag_loader(batch_size=4):
        return {
            "dataset": {
                "type": "AudioSamplePhrasesDataset",
                "args": {"audio": str(train_dir / "waveform_fp.csv"),
                         "label": str(train_label),
                         "phrase_num": 4, "fix_neg": False,
                         "neg_samp_stratg": "clustering",
                         "cluster_map": str(cmap_path),
                         "max_audio_length": 1.0, "seed": 11},
            },
            "collate_fn": {"type": "TextCollate",
                           "args": {"text_key": "phrases",
                                    "pad_keys": ["waveform"],
                                    "pad_buckets": {"waveform": 32000},
                                    "text_bucket": 4, "tokenizer": tok}},
            "dataloader_args": {"batch_size": batch_size},
        }

    model_cfg = {
        "type": "MultiTextBiEncoder",
        "args": {"shared_dim": 64, "add_proj": True,
                 "pooling": "linear_softmax",
                 "text_forward_keys": ["text", "text_len"]},
        "audio_encoder": {"type": "Cnn8Rnn", "args": {"sample_rate": 32000}},
        "text_encoder": {"type": "EmbeddingAgg",
                         "args": {"vocab_size": len(vocab),
                                  "embed_dim": 64}},
        "match_fn": {"type": "DotProduct", "args": {}},
    }
    train_config = {
        "experiment_path": str(root / "exp"),
        "seed": 1,
        "data": {"train": wstag_loader(), "val": wstag_loader()},
        "model": model_cfg,
        "loss": {"type": "ClipBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 2e-3}},
        "lr_scheduler": {
            "type": "torch.optim.lr_scheduler.ReduceLROnPlateau",
            "args": {"mode": "min", "patience": 3}},
        "trainer": {"epochs": 2, "early_stop": 5, "save_interval": 1,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
        "inference_args": {"time_resolution": 0.04},
    }
    eval_config = {
        "resume": "best", "n_thresholds": 10, "window_size": 1,
        "time_resolution": 0.04, "max_efprs": [None],
        "output": "result.txt",
        "data": {"test": {
            "dataset": {"type": "AudioPhraseEvalDataset",
                        "args": {"waveform": str(test_wav_csv),
                                 "label": str(test_label)}},
            "collate_fn": {"type": "TextCollate",
                           "args": {"text_key": "phrase",
                                    "pad_keys": ["waveform"],
                                    "pad_buckets": {"waveform": 32000},
                                    "text_bucket": 4, "tokenizer": tok}},
            "dataloader_args": {"batch_size": 8},
            "duration": str(test_dur),
        }},
    }
    eval_path = root / "eval.yaml"
    yaml.safe_dump(eval_config, open(eval_path, "w"))
    return {"train": train_config, "eval": str(eval_path), "root": root,
            "model": model_cfg}


def test_weak_phrase_train_eval(configs):
    from texttoaudiogrounding_tpu.training.runner_weak_phrase import \
        WeakPhraseRunner

    runner = WeakPhraseRunner()
    exp_dir = runner.train(dict(configs["train"]))
    log_text = (exp_dir / "train.log").read_text()
    assert "epoch: 2" in log_text

    results = WeakPhraseRunner().evaluate(exp_dir, configs["eval"])
    assert "psds@None" in results
    assert np.isfinite(list(results.values())).all()


def test_weak_phrase_selfsup(configs):
    from texttoaudiogrounding_tpu.training.runner_weak_phrase import \
        WeakPhraseSelfSupervisionRunner

    cfg = dict(configs["train"])
    cfg = json.loads(json.dumps(cfg))  # deep copy
    cfg["experiment_path"] = str(configs["root"] / "exp_selfsup")
    cfg["teacher"] = dict(configs["model"])
    cfg["teacher"]["checkpoint"] = str(configs["root"] / "exp" / "best")
    cfg["loss"] = {"type": "ClipFrameBceLoss",
                   "args": {"frame_weight": 0.5,
                            "clip_label_key": "label",
                            "frame_label_key": "frame_label"}}
    cfg["trainer"]["epochs"] = 1
    runner = WeakPhraseSelfSupervisionRunner()
    exp_dir = runner.train(cfg)
    assert (exp_dir / "best").exists()


def test_trainable_only_checkpoint(configs):
    """Frozen towers stay out of weak-runner checkpoints (reference
    run_weak_phrase.py:332-353) and eval/resume reconstruct them."""
    from texttoaudiogrounding_tpu.training.runner_weak_phrase import \
        WeakPhraseRunner
    from texttoaudiogrounding_tpu.training.train_state import load_checkpoint

    cfg = json.loads(json.dumps(dict(configs["train"])))
    cfg["experiment_path"] = str(configs["root"] / "exp_frozen")
    cfg["model"]["text_encoder"]["args"]["freeze_embedding"] = True
    cfg["trainer"]["epochs"] = 2

    runner = WeakPhraseRunner()
    exp_dir = runner.train(cfg)

    payload, meta = load_checkpoint(exp_dir / "best")
    assert meta["trainables_only"]
    flat = {"/".join(map(str, k)): v for k, v in
            _flatten(payload["params"])}
    emb_keys = [k for k in flat if "embedding" in k and "text_encoder" in k]
    assert not emb_keys, f"frozen embedding saved: {emb_keys}"
    assert any("audio_encoder" in k for k in flat)

    # evaluate reconstructs the frozen tower from a fresh init + merge
    results = WeakPhraseRunner().evaluate(exp_dir, configs["eval"])
    assert np.isfinite(list(results.values())).all()

    # full resume continues training from the pruned checkpoint
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["experiment_path"] = str(configs["root"] / "exp_frozen_resume")
    cfg2["resume"] = str(exp_dir / "last")
    cfg2["trainer"]["epochs"] = 3
    exp2 = WeakPhraseRunner().train(cfg2)
    log = (exp2 / "train.log").read_text()
    assert "resumed from" in log and "epoch: 3" in log


def _flatten(tree, prefix=()):
    if hasattr(tree, "items"):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree
