"""GroundingPredictor: the public (audio, audio_len, text) → probabilities
contract (reference models/hf_modeling_grounding.py:338-352)."""

import numpy as np
import pytest
import yaml

import jax

from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """A minimal experiment dir: config.yaml + freshly-initialized ckpt."""
    root = tmp_path_factory.mktemp("pred")
    wav_csv, label_json, _ = make_grounding_data(root / "data",
                                                 num_audio=3, duration=1.0)
    vocab = make_vocab(label_json, root / "data" / "vocab.pkl")
    config = {
        "data": {"train": {
            "dataset": {"type": "AudioPhraseDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json),
                                 "time_resolution": 0.04}},
            "collate_fn": {"type": "TextCollate", "args": {
                "text_key": "phrase", "pad_keys": ["waveform"],
                "tokenizer": {"type": "DictTokenizer",
                              "args": {"vocabulary": str(
                                  root / "data" / "vocab.pkl")}}}},
        }},
        "model": {
            "type": "BiEncoder",
            "args": {"shared_dim": 32, "add_proj": True},
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
    with open(exp_dir / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    from texttoaudiogrounding_tpu.training.train_state import (
        TrainState,
        save_checkpoint,
    )
    from texttoaudiogrounding_tpu.utils.registry import instantiate
    model = instantiate(config["model"])
    batch = {"waveform": np.zeros((1, 32000), np.float32),
             "waveform_len": np.array([32000]),
             "text": np.zeros((1, 4), np.int32),
             "text_len": np.array([4])}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None, step=0)
    save_checkpoint(exp_dir / "best", state, 1, {}, 0,
                    include_optim=False)
    return exp_dir


def test_predict_contract(experiment, rng):
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    predictor = GroundingPredictor.from_experiment(str(experiment))
    audio = rng.normal(size=(2, 40000)).astype(np.float32) * 0.1
    lens = np.array([40000, 20000])
    probs = predictor.predict(audio, lens, ["dog barking", "a man"])
    # 40000 samples → 125 frame frames; 20000 → 62 valid, padded zeroed
    assert probs.shape[0] == 2
    valid0 = (40000 // 320 + 1) // 4
    valid1 = (20000 // 320 + 1) // 4
    assert (probs[0, :valid0] > 0).all()
    assert (probs[1, valid1:] == 0).all()
    assert (probs <= 1.0).all()

    # single clip + decode to segments
    segments = predictor.ground(audio[:1], [40000], ["dog barking"],
                                threshold=0.0)
    assert segments[0][0][0] == 0.0  # threshold 0 → everything active


def test_predict_shape_bucketing(experiment, rng):
    """Different audio lengths within one bucket must not retrace."""
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    predictor = GroundingPredictor.from_experiment(str(experiment))
    for n in (31000, 31500, 32000):
        audio = rng.normal(size=(1, n)).astype(np.float32)
        probs = predictor.predict(audio, [n], ["dog barking"])
        assert np.isfinite(probs).all()


def test_export_deployment_roundtrip(experiment, rng, tmp_path):
    """Export → standalone dir → load WITHOUT the experiment tree →
    identical predictions (the reference's trust_remote_code artifact
    equivalent: deploy.json + weights.npz + vocabulary)."""
    import shutil

    from texttoaudiogrounding_tpu.deployment import (
        export_deployment,
        predictor_from_deployment,
    )
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    out = export_deployment(str(experiment), str(tmp_path / "deploy"))
    assert (out / "deploy.json").exists()
    assert (out / "weights.npz").exists()
    assert (out / "vocabulary.pkl").exists()

    # move the artifact elsewhere: it must be fully self-contained
    moved = tmp_path / "moved"
    shutil.move(str(out), str(moved))

    ref = GroundingPredictor.from_experiment(str(experiment))
    dep = predictor_from_deployment(str(moved))
    audio = (rng.normal(size=(2, 48000)) * 0.1).astype(np.float32)
    lens = np.array([48000, 32000])
    text = ["a dog barks", "water"]
    a = ref.predict(audio, lens, text)
    b = dep.predict(audio, lens, text)
    np.testing.assert_allclose(a, b, atol=1e-6)

    # new exports carry batch_buckets explicitly; a pre-bucketing
    # artifact (no field) must keep its original exact-size behavior
    import json

    assert dep.batch_buckets == ref.batch_buckets
    meta = json.load(open(moved / "deploy.json"))
    meta.pop("batch_buckets")
    json.dump(meta, open(moved / "deploy.json", "w"))
    legacy = predictor_from_deployment(str(moved))
    assert legacy.batch_buckets == ()

    # the exportable model family additionally publishes a
    # reference-format torch checkpoint that imports back bit-exactly
    import json

    from texttoaudiogrounding_tpu.training.torch_import import (
        import_biencoder,
        load_torch_state_dict,
        merge_into_variables,
    )
    deploy_meta = json.load(open(moved / "deploy.json"))
    assert deploy_meta["torch_checkpoint"] == "model.pth"
    sd = load_torch_state_dict(moved / "model.pth")
    back = import_biencoder(sd)
    skipped = []
    merged = merge_into_variables(ref.variables, back,
                                  log_fn=lambda m: skipped.append(m))
    assert not skipped, skipped
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        merged, ref.variables)


def test_batch_bucketing(experiment, rng):
    """The batch dim is padded to the configured buckets: different
    incoming sizes share one compiled shape, results match an exact-size
    predictor row-for-row, and padded rows never leak out."""
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    predictor = GroundingPredictor.from_experiment(str(experiment))
    assert predictor.batch_buckets == (1, 8, 16, 32, 64, 128)

    # buckets are overridable per-call site (ADVICE round 3: e.g. the
    # DESED per-clip class sweep wants its own size or exact batches)
    tuned = GroundingPredictor.from_experiment(str(experiment),
                                               batch_buckets=(4,))
    assert tuned.batch_buckets == (4,)
    disabled = GroundingPredictor.from_experiment(str(experiment),
                                                  batch_buckets=())
    assert disabled.batch_buckets == ()

    seen = []
    orig = predictor._forward

    def spy(variables, batch):
        seen.append(batch["waveform"].shape[0])
        return orig(variables, batch)

    predictor._forward = spy
    audio = (rng.normal(size=(5, 32000)) * 0.1).astype(np.float32)
    lens = np.full(5, 32000, np.int64)
    text = ["dog barking", "a man", "water", "dog barking", "a man"]
    probs5 = predictor.predict(audio, lens, text)
    probs3 = predictor.predict(audio[:3], lens[:3], text[:3])
    probs1 = predictor.predict(audio[:1], lens[:1], text[:1])
    assert seen == [8, 8, 1]  # 5 and 3 share the B=8 graph; 1 is exact
    assert probs5.shape[0] == 5 and probs3.shape[0] == 3
    assert probs1.shape[0] == 1

    exact = GroundingPredictor.from_experiment(str(experiment))
    exact.batch_buckets = ()
    ref = exact.predict(audio[:3], lens[:3], text[:3])
    np.testing.assert_allclose(probs3, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(probs5[:3], ref, rtol=1e-5, atol=1e-6)


def test_batch_splitting(experiment, rng):
    """Batches beyond the largest bucket are SPLIT into bucket-sized
    sub-batches (off-128 sizes run far slower monolithically — the
    round-3 B=144 envelope finding), and results match row-for-row."""
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    predictor = GroundingPredictor.from_experiment(str(experiment))
    # plan shapes: greedy largest bucket + one padded remainder chunk
    assert predictor._chunk_plan(144) == [(0, 128, 128), (128, 16, 16)]
    assert predictor._chunk_plan(300) == [(0, 128, 128), (128, 128, 128),
                                          (256, 44, 64)]
    assert predictor._chunk_plan(128) == [(0, 128, 128)]
    assert predictor._chunk_plan(5) == [(0, 5, 8)]

    small = GroundingPredictor.from_experiment(str(experiment),
                                               batch_buckets=(1, 2, 4))
    seen = []
    orig = small._forward

    def spy(variables, batch):
        seen.append(batch["waveform"].shape[0])
        return orig(variables, batch)

    small._forward = spy
    audio = (rng.normal(size=(7, 32000)) * 0.1).astype(np.float32)
    lens = np.full(7, 32000, np.int64)
    text = ["dog barking", "a man", "water", "dog", "a", "b", "c"]
    probs = small.predict(audio, lens, text)
    assert seen == [4, 4]  # 7 -> 4 + (3 padded to 4)
    assert probs.shape[0] == 7

    exact = GroundingPredictor.from_experiment(str(experiment),
                                               batch_buckets=())
    ref = exact.predict(audio, lens, text)
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-6)

    # with a mesh batch multiple that does not divide the largest
    # (user-overridable) bucket, FULL chunks must round up too — not
    # just the remainder chunk (ADVICE round 4)
    meshy = GroundingPredictor.from_experiment(str(experiment),
                                               batch_buckets=(3, 6))
    meshy._batch_multiple = 4
    assert meshy._chunk_plan(14) == [(0, 6, 8), (6, 6, 8), (12, 2, 4)]
    for _, _, target in meshy._chunk_plan(14):
        assert target % 4 == 0
