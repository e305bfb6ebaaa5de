"""Host-side data-pipeline rate: dataset read + collate + thread-pool
loader, no device involved.  This is the number that must exceed the
device step rate (887 clips/s bf16 at B=128) for the loader to never
stall training (VERDICT r2 weak #7).

Usage: python scripts/bench_loader.py [f16|f32]
  f16 (default) — waveforms stay in the HDF5 float16 storage dtype on
  the wire (datasets._as_wire), halving host memcpy;
  f32 — forces the legacy upcast-at-read path for comparison.
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from tests.synthetic import make_grounding_data, make_vocab  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f16"
    root = Path(tempfile.mkdtemp(prefix=f"loaderbench_{mode}_"))
    wav_csv, label_json, _ = make_grounding_data(
        root / "d", num_audio=256, duration=10.0, seed=3)

    if mode == "f32":
        # monkeypatch the wire helper back to the legacy upcast
        from texttoaudiogrounding_tpu.data import datasets as dsmod
        dsmod._as_wire = lambda w: np.asarray(w, dtype=np.float32)

    from texttoaudiogrounding_tpu.data.datasets import AudioPhraseDataset
    from texttoaudiogrounding_tpu.data.collate import TextCollate
    from texttoaudiogrounding_tpu.data.loader import DataLoader
    from texttoaudiogrounding_tpu.data.tokenizer import DictTokenizer

    vocab_path = root / "vocab.pkl"
    make_vocab(label_json, vocab_path)
    ds = AudioPhraseDataset(str(wav_csv), str(label_json),
                            time_resolution=0.04)
    collate = TextCollate(tokenizer=DictTokenizer(str(vocab_path)),
                          text_key="phrase",
                          pad_keys=["waveform", "label"],
                          pad_buckets={"waveform": 320000, "label": 251},
                          text_bucket=8)
    loader = DataLoader(ds, batch_size=128, collate_fn=collate,
                        shuffle=True, num_workers=8, prefetch=4)

    for epoch in range(3):
        loader.set_epoch(epoch)
        n = 0
        t0 = time.time()
        for batch in loader:
            n += batch["waveform"].shape[0]
            assert batch["waveform"].dtype == (
                np.float16 if mode == "f16" else np.float32)
        dt = time.time() - t0
        print(f"epoch {epoch}: {n} clips in {dt:.2f}s = "
              f"{n / dt:6.0f} clips/s host-side ({mode})")


if __name__ == "__main__":
    main()
