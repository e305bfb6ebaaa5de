"""AutoModel publish path: export → ``AutoModel.from_pretrained(dir,
trust_remote_code=True)`` → forward matches ``GroundingPredictor``
(reference release mechanism, models/hf_modeling_grounding.py:305-352)."""

import numpy as np
import pytest
import yaml

import jax


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    from tests.synthetic import make_grounding_data, make_vocab

    root = tmp_path_factory.mktemp("hfexp")
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
                                      "embed_dim": 32,
                                      "aggregation": "attention"}},
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
    variables = model.init({"params": jax.random.PRNGKey(7)}, batch)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None, step=0)
    save_checkpoint(exp_dir / "best", state, 1, {}, 0, include_optim=False)
    return exp_dir


def test_automodel_roundtrip(experiment, rng, tmp_path):
    """The exported artifact loads via transformers AutoModel with
    trust_remote_code and its forward matches the native predictor."""
    import torch
    from transformers import AutoModel

    from texttoaudiogrounding_tpu.deployment import export_deployment
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    out = export_deployment(str(experiment), str(tmp_path / "artifact"))
    for fname in ("modeling_grounding.py", "config.json",
                  "pytorch_model.bin"):
        assert (out / fname).exists(), fname

    hf_model = AutoModel.from_pretrained(str(out), trust_remote_code=True)
    hf_model.eval()

    # audio at exactly the predictor's bucket size: the native path
    # zero-pads odd lengths up to the bucket while the torch artifact
    # runs exact sizes — reflect-pad vs zero-pad boundary frames would
    # differ (legitimately) and the BiGRU spreads that everywhere
    audio = (rng.normal(size=(3, 32000)) * 0.1).astype(np.float32)
    lens = np.array([32000, 32000, 32000])
    text = ["a dog barking", "water runs", "a man speaks loudly"]

    native = GroundingPredictor.from_experiment(str(experiment),
                                                batch_buckets=())
    ref = native.predict(audio, lens, text)

    with torch.no_grad():
        got = hf_model(torch.from_numpy(audio), lens, text).numpy()

    # both mask beyond the valid length; shapes may differ by padding
    t = min(ref.shape[1], got.shape[1])
    np.testing.assert_allclose(got[:, :t], ref[:, :t], atol=2e-3)
    # probabilities, not logits
    assert got.max() <= 1.0 and got.min() >= 0.0


def test_automodel_vocab_tokenization(experiment, tmp_path):
    """OOV words map to <unk> exactly like the native DictTokenizer."""
    import torch
    from transformers import AutoModel

    from texttoaudiogrounding_tpu.deployment import export_deployment

    out = export_deployment(str(experiment), str(tmp_path / "artifact"))
    hf_model = AutoModel.from_pretrained(str(out), trust_remote_code=True)
    toks = hf_model._tokenize(["dog zzzunseen", ""], torch.device("cpu"))
    unk = hf_model.vocab["<unk>"]
    assert toks["text"][0, 1].item() == unk
    assert toks["text"][1, 0].item() == unk  # empty string -> [<unk>]
    assert toks["text_len"].tolist() == [2, 1]
