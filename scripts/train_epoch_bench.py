"""One real training epoch at B=128 x 10 s through the StrongRunner
(pipeline included) — the samples/s line in train.log is the number
STATUS.md quotes for training throughput.  Usage:
    python scripts/train_epoch_bench.py [f32|bf16]
"""

import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tests.synthetic import make_grounding_data, make_vocab  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner

    root = Path(tempfile.mkdtemp(prefix=f"epoch_{mode}_"))
    wav_csv, label_json, _ = make_grounding_data(
        root / "d", num_audio=160, duration=10.0, seed=3)
    vocab_path = root / "vocab.pkl"
    vocab = make_vocab(label_json, vocab_path)

    def loader(bs):
        return {
            "dataset": {"type": "AudioPhraseDataset",
                        "args": {"waveform": str(wav_csv),
                                 "label": str(label_json),
                                 "time_resolution": 0.04}},
            "collate_fn": {"type": "TextCollate",
                           "args": {"text_key": "phrase",
                                    "pad_keys": ["waveform", "label"],
                                    "pad_buckets": {"waveform": 320000,
                                                    "label": 251},
                                    "text_bucket": 8,
                                    "tokenizer": {
                                        "type": "DictTokenizer",
                                        "args": {"vocabulary":
                                                 str(vocab_path)}}}},
            "dataloader_args": {"batch_size": bs},
        }

    enc = {"sample_rate": 32000}
    if mode == "bf16":
        enc["dtype"] = "bfloat16"
    cfg = {
        "experiment_path": str(root / "exp"), "seed": 1,
        "data": {"train": loader(128), "val": loader(128)},
        "model": {"type": "BiEncoder",
                  "args": {"shared_dim": 512, "add_proj": True},
                  "audio_encoder": {"type": "Cnn8Rnn", "args": enc},
                  "text_encoder": {"type": "EmbeddingAgg",
                                   "args": {"vocab_size": len(vocab),
                                            "embed_dim": 512}},
                  "match_fn": {"type": "DotProduct", "args": {}}},
        "loss": {"type": "FrameBceLoss", "args": {}},
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "trainer": {"epochs": 3, "early_stop": 5, "save_interval": 10,
                    "max_grad_norm": 1.0,
                    "metric_monitor": {"mode": "min", "name": "loss"}},
    }
    exp = StrongRunner().train(cfg)
    log = (exp / "train.log").read_text()
    rates = re.findall(r"([\d.]+) samples/s", log)
    print(f"mode={mode} epoch rates: {rates} samples/s "
          f"(last epoch is warm)")


if __name__ == "__main__":
    main()
