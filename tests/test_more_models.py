"""Cross (FiLM) models, sentence-align models, class-mapping datasets."""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models import Cnn8Rnn, EmbeddingAgg
from texttoaudiogrounding_tpu.models.align import AlignDotProduct
from texttoaudiogrounding_tpu.models.align_models import (
    AudioTextAlignByPhrase,
    AudioTextAlignByWord,
    AudioTextCrossAlignByPhrase,
)
from texttoaudiogrounding_tpu.models.cross_encoder import CrossAttentionGating
from texttoaudiogrounding_tpu.models.cross_models import (
    CrossCDur,
    CrossCnn8Rnn,
)
from texttoaudiogrounding_tpu.models.match import CrossAttention
from texttoaudiogrounding_tpu.models.sim_pooling import SimPooling

SR = 32000


@pytest.fixture
def base_batch(rng):
    n = SR
    return {
        "waveform": jnp.asarray(rng.normal(size=(2, n)).astype(np.float32)
                                * 0.1),
        "waveform_len": jnp.array([n, n // 2]),
        "text": jnp.asarray(rng.integers(1, 50, size=(2, 5))),
        "text_len": jnp.array([5, 3]),
    }


def test_cross_cdur(base_batch):
    model = CrossCDur(sample_rate=SR,
                      text_encoder=EmbeddingAgg(vocab_size=50,
                                                embed_dim=256))
    params = model.init({"params": jax.random.PRNGKey(0)}, base_batch)
    out = model.apply(params, base_batch)
    assert out["frame_sim"].shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out["length"]), [12, 6])
    fs = np.asarray(out["frame_sim"])
    assert (fs >= 1e-7).all() and (fs <= 1).all()


def test_cross_cnn8rnn(base_batch):
    model = CrossCnn8Rnn(sample_rate=SR,
                         text_encoder=EmbeddingAgg(vocab_size=50,
                                                   embed_dim=256))
    params = model.init({"params": jax.random.PRNGKey(0)}, base_batch)
    out = model.apply(params, base_batch)
    # keeps the singleton class axis like the reference (:818-819)
    assert out["frame_sim"].shape == (2, 25, 1)
    np.testing.assert_array_equal(np.asarray(out["length"]), [25, 12])


def test_align_by_word(base_batch):
    model = AudioTextAlignByWord(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=512),
        match_fn=AlignDotProduct(),
        sim_pooling=SimPooling(audio_pool="max", text_pool="mean"))
    params = model.init({"params": jax.random.PRNGKey(0)}, base_batch)
    out = model.apply(params, {**base_batch, "output_matrix": True})
    assert out["sim"].shape == (2, 2)
    assert out["sim_matrix"].shape == (2, 2, 25, 5)


@pytest.fixture
def phrase_batch(rng):
    n = SR
    return {
        "waveform": jnp.asarray(rng.normal(size=(2, n)).astype(np.float32)
                                * 0.1),
        "waveform_len": jnp.array([n, n // 2]),
        "phrases": jnp.asarray(rng.integers(1, 50, size=(5, 4))),
        "phrases_len": jnp.array([4, 2, 3, 4, 1]),
        "phrases_num": jnp.array([2, 3]),
        "phrases_pad_index": jnp.array([[0, 1, 0], [2, 3, 4]]),
    }


def test_align_by_phrase(phrase_batch):
    model = AudioTextAlignByPhrase(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=512),
        match_fn=AlignDotProduct(),
        sim_pooling=SimPooling(audio_pool="max", text_pool="mean"))
    params = model.init({"params": jax.random.PRNGKey(0)}, phrase_batch)
    out = model.apply(params, {**phrase_batch, "output_matrix": True})
    assert out["sim"].shape == (2, 2)
    # padded phrase slots are zeroed before the align
    sm = np.asarray(out["sim_matrix"])
    assert sm.shape == (2, 2, 25, 3)


def test_cross_align_by_phrase(phrase_batch):
    model = AudioTextCrossAlignByPhrase(
        audio_encoder=Cnn8Rnn(sample_rate=SR),
        text_encoder=EmbeddingAgg(vocab_size=50, embed_dim=512),
        match_fn=CrossAttention(embed_dim=512, num_heads=4),
        sim_pooling=SimPooling(audio_pool="max", text_pool="mean"),
        cross_encoder=CrossAttentionGating(embed_dim=512))
    params = model.init({"params": jax.random.PRNGKey(0)}, phrase_batch)
    out = model.apply(params, phrase_batch)
    assert out["sim"].shape == (2, 2)
    assert out["sim_matrix"].shape == (2, 2, 25, 3)
    # padded phrase slot of sample 0 (only 2 phrases) is masked to 0
    assert np.asarray(out["sim_matrix"])[:, 0, :, 2].max() == 0.0


def test_class_mapping_datasets(tmp_path, rng):
    from sklearn.cluster import KMeans
    from sklearn.preprocessing import LabelEncoder

    from tests.synthetic import EVENT_WORDS, make_grounding_data
    from texttoaudiogrounding_tpu.data.class_mapping import (
        ASMappingEvalDataset,
        ASMappingStrongDataset,
        ASMappingWeakDataset,
        KmeansMappingDataset,
        SpectralMappingDataset,
    )

    wav_csv, label_json, _ = make_grounding_data(tmp_path, num_audio=5)
    items = json.load(open(label_json))
    phrases = sorted({p["phrase"] for it in items for p in it["phrases"]})
    emb_dim = 8
    phrase_embs = {p: rng.normal(size=emb_dim).astype(np.float32)
                   for p in phrases}
    classes = ["Dog", "Speech", "Bird"]
    label_embs = {c: rng.normal(size=emb_dim).astype(np.float32)
                  for c in classes}
    pickle.dump(phrase_embs, open(tmp_path / "pemb.pkl", "wb"))
    pickle.dump(label_embs, open(tmp_path / "lemb.pkl", "wb"))
    le = LabelEncoder().fit(classes)
    pickle.dump(le, open(tmp_path / "le.pkl", "wb"))
    with open(tmp_path / "as_label.csv", "w") as f:
        f.write("audio_id\tevent_labels\n")
        for it in items:
            f.write(f"{it['audio_id']}\tDog;Speech\n")

    ds = ASMappingEvalDataset(str(wav_csv), str(label_json),
                              str(tmp_path / "pemb.pkl"),
                              str(tmp_path / "lemb.pkl"))
    item = ds[0]
    assert 0 <= item["text_idx"] < len(classes)

    ds = ASMappingWeakDataset(
        str(wav_csv), str(label_json), str(tmp_path / "as_label.csv"),
        str(tmp_path / "pemb.pkl"), str(tmp_path / "lemb.pkl"),
        str(tmp_path / "le.pkl"), thresholds=[-1.0, 1.0])
    item = ds[0]
    assert item["label"].shape == (3,)
    assert item["label"][le.transform(["Dog"])[0]] == 1  # audioset tag

    ds = ASMappingStrongDataset(
        str(wav_csv), str(label_json), str(tmp_path / "as_label.csv"),
        str(tmp_path / "pemb.pkl"), str(tmp_path / "lemb.pkl"),
        str(tmp_path / "le.pkl"), thresholds=[-1.0, 1.0],
        time_resolution=0.04)
    item = ds[0]
    assert item["strong_label"].shape[1] == 3
    assert item["strong_label_mask"].sum() >= 1
    # rasterized frames match the phrase segments
    assert item["strong_label"].sum() > 0

    km = KMeans(n_clusters=2, n_init=3, random_state=0).fit(
        np.stack(list(phrase_embs.values())))
    import joblib
    joblib.dump(km, tmp_path / "km.joblib")
    ds = KmeansMappingDataset(str(wav_csv), str(label_json),
                              str(tmp_path / "pemb.pkl"),
                              str(tmp_path / "km.joblib"),
                              label_type="strong", time_resolution=0.04,
                              max_dist_percent=100.0)
    item = ds[0]
    assert item["strong_label"].shape[1] == 2
    assert item["weak_label"].sum() >= 1

    cmap = {0: phrases[::2], 1: phrases[1::2]}
    json.dump(cmap, open(tmp_path / "cmap.json", "w"))
    ds = SpectralMappingDataset(str(wav_csv), str(label_json),
                                str(tmp_path / "cmap.json"),
                                label_type="weak")
    assert ds[0]["label"].shape == (2,)
