"""Every shipped recipe YAML is runnable through the CLI.

Mirrors the reference's ``eg_configs`` coverage (SURVEY §2.4 paradigms):
each train recipe is smoke-run for one tiny epoch on synthetic data via
``python -m texttoaudiogrounding_tpu.cli <runner> train <config>
overrides...`` (in-process main(), same code path), pinning that the
shipped YAMLs stay loadable, registry names resolve, and the runner
wiring works end-to-end — not just test-fixture configs.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from texttoaudiogrounding_tpu.cli import main as cli_main
from tests.synthetic import make_grounding_data, make_vocab

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("shipped")
    # dict-format labels (strong / sentence / class-mapping)
    wav_csv, label_json, dur_csv = make_grounding_data(
        root / "d", num_audio=6, duration=1.0, seed=7)
    # str-phrase labels + file_path csv (WSTAG phrase datasets)
    wav_fp_csv, label_str_json, _ = make_grounding_data(
        root / "w", num_audio=6, duration=1.0, seed=8,
        phrases_as_str=True)
    vocab_path = root / "vocab.pkl"
    items = json.load(open(label_json)) + json.load(open(label_str_json))
    from texttoaudiogrounding_tpu.data.vocabulary import build_vocab
    vocab = build_vocab(items, vocab_path)

    phrases = sorted({p for it in json.load(open(label_str_json))
                      for p in it["phrases"]})
    cmap = {str(i): phrases[i::2] for i in range(2)}
    cmap_path = root / "cmap.json"
    json.dump(cmap, open(cmap_path, "w"))
    # phrase embeddings for similarity sampling + a fitted kmeans model
    import pickle
    rng = np.random.default_rng(0)
    emb = {p: rng.normal(size=8).astype(np.float32) for p in phrases}
    # dict-format labels use their own phrase set; embed those too
    emb.update({p["phrase"]: rng.normal(size=8).astype(np.float32)
                for it in json.load(open(label_json))
                for p in it["phrases"]})
    emb_path = root / "phrase_emb.pkl"
    pickle.dump(emb, open(emb_path, "wb"))
    import joblib
    from sklearn.cluster import KMeans
    km = KMeans(n_clusters=2, n_init=2, random_state=0).fit(
        np.stack(list(emb.values())))
    km_path = root / "kmeans.pkl"
    joblib.dump(km, km_path)
    return {"wav": str(wav_csv), "label": str(label_json),
            "kmeans": str(km_path),
            "wav_fp": str(root / "w" / "waveform_fp.csv"),
            "label_str": str(label_str_json),
            "dur": str(dur_csv), "vocab": str(vocab_path),
            "vocab_size": len(vocab), "cmap": str(cmap_path),
            "emb": str(emb_path), "root": root}


def _common_overrides(data, exp, extra=()):
    ov = [
        f"experiment_path={exp}",
        "trainer.epochs=1", "trainer.save_interval=1",
        "trainer.early_stop=2",
        "data.train.dataloader_args.batch_size=2",
        "data.val.dataloader_args.batch_size=2",
        "data.train.dataloader_args.num_workers=0",
        "data.val.dataloader_args.num_workers=0",
    ]
    return ov + list(extra)


def _dataset_overrides(data, split, dataset_args, collate_vocab=True):
    ov = []
    for k, v in dataset_args.items():
        ov.append(f"data.{split}.dataset.args.{k}={v}")
    if collate_vocab:
        ov.append(f"data.{split}.collate_fn.args.tokenizer.args."
                  f"vocabulary={data['vocab']}")
    return ov


def _run(runner, config, overrides):
    cli_main([runner, "train", "--config", str(config)] + overrides)


def test_strong_biencoder(data, tmp_path):
    cfg = CONFIGS / "strong" / "biencoder_train.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "waveform": data["wav"], "label": data["label"]})
    ov += [f"model.text_encoder.args.vocab_size={data['vocab_size']}",
           "model.args.shared_dim=64",
           "model.text_encoder.args.embed_dim=64"]
    _run("strong", cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


def test_strong_cdur(data, tmp_path):
    cfg = CONFIGS / "strong" / "cdur_w2vmean.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "waveform": data["wav"], "label": data["label"]})
    ov += [f"model.text_encoder.args.vocab_size={data['vocab_size']}",
           "model.args.shared_dim=64",
           "model.text_encoder.args.embed_dim=64",
           "model.audio_encoder.args.embed_dim=64"]
    _run("strong", cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


@pytest.mark.parametrize("name,extra", [
    ("cnn8rnn_w2vmean_random", []),
    ("cnn8rnn_w2vmean_similarity", ["SIM"]),
    ("cnn8rnn_w2vmean_clustering", ["CMAP"]),
])
def test_weak_phrase_variants(data, tmp_path, name, extra):
    cfg = CONFIGS / "weak_phrase" / f"{name}.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        args = {"audio": data["wav_fp"], "label": data["label_str"],
                "phrase_num": 3}
        if "SIM" in extra:
            args["phrase_embed"] = data["emb"]
        if "CMAP" in extra:
            args["cluster_map"] = data["cmap"]
        ov += _dataset_overrides(data, split, args)
    ov += [f"model.text_encoder.args.vocab_size={data['vocab_size']}",
           "model.args.shared_dim=64",
           "model.text_encoder.args.embed_dim=64"]
    _run("weak_phrase", cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


def test_weak_phrase_selfsup(data, tmp_path):
    # teacher = a one-epoch clustering model trained first
    base_cfg = CONFIGS / "weak_phrase" / "cnn8rnn_w2vmean_clustering.yaml"
    ov = _common_overrides(data, tmp_path / "teacher")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "audio": data["wav_fp"], "label": data["label_str"],
            "phrase_num": 3, "cluster_map": data["cmap"]})
    small = [f"model.text_encoder.args.vocab_size={data['vocab_size']}",
             "model.args.shared_dim=64",
             "model.text_encoder.args.embed_dim=64"]
    _run("weak_phrase", base_cfg, ov + small)

    cfg = CONFIGS / "weak_phrase" / "cnn8rnn_w2vmean_clustering_selfsup.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "audio": data["wav_fp"], "label": data["label_str"],
            "phrase_num": 3, "cluster_map": data["cmap"]})
    ov += small
    ov += [f"teacher.pretrained={tmp_path / 'teacher' / 'best'}",
           f"teacher.text_encoder.args.vocab_size={data['vocab_size']}",
           "teacher.args.shared_dim=64",
           "teacher.text_encoder.args.embed_dim=64"]
    _run("weak_phrase_selfsup", cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


@pytest.mark.parametrize("sub,name", [
    ("phrase_wise", "cnn8rnn_w2vmean_dp_amean_tmean"),
    ("word_wise", "cnn8rnn_w2v_dp_amean_tmean"),
])
def test_weak_sentence(data, tmp_path, sub, name):
    cfg = CONFIGS / "weak_sentence" / sub / f"{name}.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "waveform": data["wav"], "label": data["label"]})
    ov += [f"model.text_encoder.args.vocab_size={data['vocab_size']}",
           "model.args.shared_dim=64",
           "model.text_encoder.args.embed_dim=64"]
    _run("weak_sentence", cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


@pytest.mark.parametrize("name,runner", [
    ("kmeans_weak", "class_mapping_weak"),
    ("kmeans_strong", "class_mapping_strong"),
])
def test_class_mapping(data, tmp_path, name, runner):
    cfg = CONFIGS / "class_mapping" / f"{name}.yaml"
    ov = _common_overrides(data, tmp_path / "exp")
    for split in ("train", "val"):
        ov += _dataset_overrides(data, split, {
            "waveform": data["wav"], "label": data["label"],
            "phrase_embed": data["emb"],
            "cluster_model": data["kmeans"]}, collate_vocab=False)
    ov += ["model.args.classes_num=2"]
    _run(runner, cfg, ov)
    assert (tmp_path / "exp" / "best").exists()


def test_desed_config_loads():
    cfg = yaml.safe_load(open(CONFIGS / "desed" / "zero_shot_eval.yaml"))
    from texttoaudiogrounding_tpu.evaluation.desed import (
        CLASS_TO_PHRASE, DESED_CLASSES)
    assert set(cfg["class_phrases"]) == set(DESED_CLASSES)
    # prompts are the reference's behavioral constants
    # (evaluate_on_desed.py:131-141)
    assert cfg["class_phrases"] == CLASS_TO_PHRASE


def test_eval_configs_load():
    for p in CONFIGS.rglob("*eval*.yaml"):
        cfg = yaml.safe_load(open(p))
        assert isinstance(cfg, dict) and cfg, p
