"""Data pipeline: vocab, tokenizers, collates, datasets, loader."""

import json

import numpy as np
import pytest

from texttoaudiogrounding_tpu.data import (
    AudioPhraseDataset,
    AudioPhraseEvalDataset,
    AudioSamplePhrasesDataset,
    DataLoader,
    DictTokenizer,
    TextCollate,
    VarLenPadCollate,
    Vocabulary,
    build_vocab,
)
from tests.synthetic import make_grounding_data, make_vocab


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    wav_csv, label_json, dur_csv = make_grounding_data(root, num_audio=6)
    vocab = make_vocab(label_json, root / "vocab.pkl")
    return {"root": root, "wav_csv": wav_csv, "label": label_json,
            "dur": dur_csv, "vocab": vocab}


@pytest.fixture(scope="module")
def wstag_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_wstag")
    wav_csv, label_json, dur_csv = make_grounding_data(
        root, num_audio=6, phrases_as_str=True)
    return {"root": root, "label": label_json}


def test_vocab_roundtrip(tmp_path):
    vocab = build_vocab([{"tokens": "a dog barking"}],
                        tmp_path / "vocab.pkl")
    loaded = Vocabulary.load(tmp_path / "vocab.pkl")
    assert loaded("dog") == vocab("dog")
    assert loaded("zzz") == loaded.word2idx["<unk>"]
    assert loaded.word2idx["<pad>"] == 0


def test_dict_tokenizer(data_dir):
    tok = DictTokenizer(data_dir["vocab"])
    words = [w for w in data_dir["vocab"].word2idx
             if w not in ("<pad>", "<unk>")][:3]
    out = tok([" ".join(words[:2]), words[2]])
    assert out["text"].shape[0] == 2
    assert out["text_len"].tolist() == [2, 1]
    nested = tok([[" ".join(words[:2]), words[0]], [words[1], words[2]]])
    assert nested["text"].shape[:2] == (2, 2)
    assert nested["text_len"].shape == (2, 2)
    # inverse transform stops at <pad>=0
    assert tok.inverse_transform(out["text"])[1] == words[2]
    # OOV maps to <unk>
    assert tok(["zzzq"])["text"][0, 0] == data_dir["vocab"]("<unk>")


def test_strong_dataset_and_label_raster(data_dir):
    ds = AudioPhraseDataset(str(data_dir["wav_csv"]),
                            str(data_dir["label"]),
                            time_resolution=0.04)
    item = ds[0]
    # f16-packed HDF5 stays f16 on the wire (datasets._as_wire);
    # upcast happens on device inside the jitted step
    assert item["waveform"].dtype == np.float16
    # 2 s audio at 0.04 s resolution → floor(2/0.04)+1 = 51 frames
    assert item["label"].shape == (51,)
    seg = json.load(open(data_dir["label"]))[0]["phrases"][0]["segments"][0]
    on, off = round(seg[0] / 0.04), round(seg[1] / 0.04)
    assert item["label"][on:off].min() == 1
    assert item["label"].sum() == off - on


def test_eval_dataset_index(data_dir):
    ds = AudioPhraseEvalDataset(str(data_dir["wav_csv"]),
                                str(data_dir["label"]))
    items = json.load(open(data_dir["label"]))
    assert len(ds) == sum(len(it["phrases"]) for it in items)
    assert ds[0]["phrase"] == items[0]["phrases"][0]["phrase"]


def test_collates_and_loader(data_dir):
    tok = DictTokenizer(data_dir["vocab"])
    ds = AudioPhraseDataset(str(data_dir["wav_csv"]), str(data_dir["label"]),
                            time_resolution=0.04)
    collate = TextCollate(tokenizer=tok, text_key="phrase",
                          pad_keys=["waveform", "label"],
                          pad_buckets={"waveform": 32000})
    loader = DataLoader(ds, batch_size=4, collate_fn=collate, shuffle=True,
                        num_workers=2)
    batch = next(iter(loader))
    assert batch["waveform"].shape[0] == 4
    # bucketing: padded length is a multiple of 32000
    assert batch["waveform"].shape[1] % 32000 == 0
    assert batch["text"].ndim == 2
    assert "waveform_len" in batch and "label_len" in batch
    # full epoch, sharding
    l0 = DataLoader(ds, batch_size=2, collate_fn=collate,
                    shard_index=0, num_shards=2)
    l1 = DataLoader(ds, batch_size=2, collate_fn=collate,
                    shard_index=1, num_shards=2)
    n0 = sum(b["waveform"].shape[0] for b in l0)
    n1 = sum(b["waveform"].shape[0] for b in l1)
    assert n0 + n1 == len(ds)


def test_varlen_pad_collate():
    batch = [{"waveform": np.ones(5, np.float32), "audio_id": "a"},
             {"waveform": np.ones(3, np.float32), "audio_id": "b"}]
    out = VarLenPadCollate(pad_keys=["waveform"])(batch)
    assert out["waveform"].shape == (2, 5)
    assert out["waveform_len"].tolist() == [5, 3]
    assert out["audio_id"] == ["a", "b"]


@pytest.mark.parametrize("strategy", ["random", "clustering", "similarity"])
def test_wstag_negative_sampling(wstag_dir, tmp_path, strategy):
    root = wstag_dir["root"]
    label = json.load(open(wstag_dir["label"]))
    all_phrases = sorted({p for it in label for p in it["phrases"]})
    kwargs = {}
    if strategy == "clustering":
        cmap = {0: all_phrases[: len(all_phrases) // 2],
                1: all_phrases[len(all_phrases) // 2:]}
        cmap_path = tmp_path / "clusters.json"
        json.dump(cmap, open(cmap_path, "w"))
        kwargs["cluster_map"] = str(cmap_path)
    elif strategy == "similarity":
        import pickle
        rng = np.random.default_rng(0)
        embs = {p: rng.normal(size=8).astype(np.float32)
                for p in all_phrases}
        emb_path = tmp_path / "emb.pkl"
        pickle.dump(embs, open(emb_path, "wb"))
        kwargs.update(phrase_embed=str(emb_path), sim_threshold=0.99)

    ds = AudioSamplePhrasesDataset(
        audio=str(root / "waveform_fp.csv"), label=str(wstag_dir["label"]),
        phrase_num=6, fix_neg=False, neg_samp_stratg=strategy,
        max_audio_length=1.0, seed=7, **kwargs)
    item = ds[0]
    assert len(item["phrases"]) == 6
    assert item["label"].sum() == len(label[0]["phrases"])
    assert item["waveform"].shape[0] == 32000  # cropped to 1 s
    # positives first, negatives not among positives
    pos = set(label[0]["phrases"])
    negs = item["phrases"][int(item["label"].sum()):]
    assert not pos & set(negs)
    # reproducible under same seed
    ds2 = AudioSamplePhrasesDataset(
        audio=str(root / "waveform_fp.csv"), label=str(wstag_dir["label"]),
        phrase_num=6, fix_neg=False, neg_samp_stratg=strategy,
        max_audio_length=1.0, seed=7, **kwargs)
    assert ds2[0]["phrases"] == item["phrases"]


def test_clustering_all_clusters_positive(wstag_dir, tmp_path):
    """Degenerate case: every cluster holds a positive phrase — the
    reference's multi-pass allocation would loop forever
    (multi_phrase_dataset.py:248-260); we fall back to random sampling."""
    root = wstag_dir["root"]
    label = json.load(open(wstag_dir["label"]))
    all_phrases = sorted({p for it in label for p in it["phrases"]})
    # every phrase in ONE cluster → every sample's positives hit it
    cmap_path = tmp_path / "one_cluster.json"
    json.dump({0: all_phrases}, open(cmap_path, "w"))
    ds = AudioSamplePhrasesDataset(
        audio=str(root / "waveform_fp.csv"), label=str(wstag_dir["label"]),
        phrase_num=5, fix_neg=False, neg_samp_stratg="clustering",
        cluster_map=str(cmap_path), seed=3)
    item = ds[0]  # must not hang
    assert len(item["phrases"]) == 5
    pos = int(item["label"].sum())
    assert not set(label[0]["phrases"]) & set(item["phrases"][pos:])


def test_fix_neg_cache(wstag_dir):
    root = wstag_dir["root"]
    ds = AudioSamplePhrasesDataset(
        audio=str(root / "waveform_fp.csv"), label=str(wstag_dir["label"]),
        phrase_num=5, fix_neg=True, neg_samp_stratg="random", seed=1)
    first = ds[0]["phrases"]
    second = ds[0]["phrases"]
    assert first == second  # cached negatives stay fixed


def test_f16_wire_and_device_feed(data_dir):
    """f16 wire format: the dataset keeps HDF5 float16 through collate,
    array_batch passes it through, upcast_wire upcasts bit-identically
    to a host-side upcast; device_feed yields batches in order and
    propagates worker exceptions."""
    from texttoaudiogrounding_tpu.parallel.mesh import device_feed, get_mesh
    from texttoaudiogrounding_tpu.training.runner_base import (array_batch,
                                                               upcast_wire)
    tok = DictTokenizer(data_dir["vocab"])
    ds = AudioPhraseDataset(str(data_dir["wav_csv"]), str(data_dir["label"]),
                            time_resolution=0.04)
    collate = TextCollate(tokenizer=tok, text_key="phrase",
                          pad_keys=["waveform", "label"],
                          pad_buckets={"waveform": 32000})
    loader = DataLoader(ds, batch_size=2, collate_fn=collate)
    batches = list(loader)
    arr = array_batch(batches[0])
    assert arr["waveform"].dtype == np.float16
    up = upcast_wire(arr)
    assert up["waveform"].dtype == np.float32
    np.testing.assert_array_equal(up["waveform"],
                                  arr["waveform"].astype(np.float32))

    mesh = get_mesh()
    n_dev = mesh.devices.size
    fed = list(device_feed(iter(batches), mesh, n_dev,
                           prepare=array_batch))
    assert len(fed) == len(batches)
    for (dev, host, real_bs), src in zip(fed, batches):
        assert real_bs == src["waveform"].shape[0]
        assert host is src
        assert dev["waveform"].shape[0] % n_dev == 0
        got = np.asarray(dev["waveform"])[:real_bs]
        np.testing.assert_array_equal(got, src["waveform"])

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    it = device_feed(boom(), mesh, n_dev, prepare=array_batch)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)


def test_process_worker_loader_matches_thread(tmp_path):
    """worker_type='process' (spawn + shared-memory transport) yields the
    same batches as the thread loader for deterministic datasets, across
    epochs, preserving order and non-array fields."""
    from tests.synthetic import make_grounding_data, make_vocab
    from texttoaudiogrounding_tpu.data.collate import TextCollate
    from texttoaudiogrounding_tpu.data.datasets import AudioPhraseDataset
    from texttoaudiogrounding_tpu.data.loader import DataLoader
    from texttoaudiogrounding_tpu.data.tokenizer import DictTokenizer
    import numpy as np

    wav_csv, label_json, _ = make_grounding_data(tmp_path / "d",
                                                 num_audio=6, duration=1.0)
    vocab = make_vocab(label_json, tmp_path / "vocab.pkl")
    ds = AudioPhraseDataset(str(wav_csv), str(label_json),
                            time_resolution=0.04)
    ds[0]  # populate the h5 handle cache — pickling must survive it
    collate = TextCollate(tokenizer=DictTokenizer(str(tmp_path
                                                      / "vocab.pkl")),
                          text_key="phrase",
                          pad_keys=["waveform", "label"])
    kw = dict(batch_size=4, collate_fn=collate, shuffle=True,
              num_workers=2, prefetch=2)
    thread = DataLoader(ds, worker_type="thread", **kw)
    proc = DataLoader(ds, worker_type="process", **kw)
    for epoch in (0, 1):
        thread.set_epoch(epoch)
        proc.set_epoch(epoch)
        got_t, got_p = list(thread), list(proc)
        assert len(got_t) == len(got_p) > 0
        for bt, bp in zip(got_t, got_p):
            assert set(bt) == set(bp)
            for key in bt:
                if isinstance(bt[key], np.ndarray):
                    np.testing.assert_array_equal(bt[key], bp[key],
                                                  err_msg=key)
                else:
                    assert bt[key] == bp[key], key


class _BadDataset:
    """Module-level (spawn-picklable) dataset that fails on one item."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 5:
            raise ValueError("boom")
        return {"x": np.zeros(4, np.float32)}


def test_process_worker_loader_propagates_errors():
    from texttoaudiogrounding_tpu.data.loader import DataLoader

    loader = DataLoader(_BadDataset(), batch_size=4, num_workers=2,
                        worker_type="process")
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_process_worker_loader_survives_abandoned_iteration(tmp_path):
    """Breaking out mid-epoch must not corrupt the next epoch (stale
    in-flight results are dropped by sequence number)."""
    from tests.synthetic import make_grounding_data, make_vocab
    from texttoaudiogrounding_tpu.data.collate import TextCollate
    from texttoaudiogrounding_tpu.data.datasets import AudioPhraseDataset
    from texttoaudiogrounding_tpu.data.loader import DataLoader
    from texttoaudiogrounding_tpu.data.tokenizer import DictTokenizer

    wav_csv, label_json, _ = make_grounding_data(tmp_path / "d",
                                                 num_audio=6, duration=1.0)
    make_vocab(label_json, tmp_path / "vocab.pkl")
    ds = AudioPhraseDataset(str(wav_csv), str(label_json),
                            time_resolution=0.04)
    collate = TextCollate(tokenizer=DictTokenizer(str(tmp_path
                                                      / "vocab.pkl")),
                          text_key="phrase",
                          pad_keys=["waveform", "label"])
    loader = DataLoader(ds, batch_size=2, collate_fn=collate,
                        shuffle=True, num_workers=2, prefetch=2,
                        worker_type="process")
    loader.set_epoch(0)
    for batch in loader:
        break  # abandon with several batches in flight
    loader.set_epoch(1)
    full = list(loader)
    ref = DataLoader(ds, batch_size=2, collate_fn=collate, shuffle=True,
                     num_workers=0)
    ref.set_epoch(1)
    expect = list(ref)
    assert len(full) == len(expect)
    for bp, bt in zip(full, expect):
        np.testing.assert_array_equal(bp["waveform"], bt["waveform"])


def test_pad_sequence_mixed_dtype_promotes():
    """A corpus mixing f16-packed and f32 HDF5 sources must not
    truncate f32 rows to f16, nor flip-flop the batch dtype with
    whichever clip lands first (that would retrace jit per batch)."""
    from texttoaudiogrounding_tpu.data.collate import pad_sequence

    f16 = np.arange(6, dtype=np.float16)
    f32 = (np.arange(8, dtype=np.float32) + 0.123456789)
    out_a, _ = pad_sequence([f16, f32])
    out_b, _ = pad_sequence([f32, f16])
    assert out_a.dtype == out_b.dtype == np.float32
    np.testing.assert_array_equal(out_a[1][:8], f32)
    np.testing.assert_array_equal(out_b[0][:8], f32)
    # all-f16 batches stay f16 (the wire-format fast path)
    out_c, _ = pad_sequence([f16, f16])
    assert out_c.dtype == np.float16


def test_dataset_reseed_deterministic_and_decorrelated():
    """Base Dataset.reseed: same salt -> same stream (a batch draws the
    same randoms no matter which worker runs it), different salts ->
    different streams (forkserver workers don't draw in lockstep)."""
    from texttoaudiogrounding_tpu.data.datasets import Dataset

    class WithRng(Dataset):
        def __init__(self):
            self.rng = np.random.default_rng(7)
            self._seed = 7

    a, b = WithRng(), WithRng()
    a.reseed(3)
    b.reseed(3)
    np.testing.assert_array_equal(a.rng.random(4), b.rng.random(4))
    a.reseed(3)
    b.reseed(4)
    assert not np.allclose(a.rng.random(4), b.rng.random(4))
    Dataset.reseed(object.__new__(Dataset), 1)  # rng-less: a no-op


def test_device_feed_consumer_abort_releases_producer(data_dir):
    """Closing the device_feed generator mid-epoch (step exception,
    break) must terminate the producer thread instead of leaving it
    blocked on the queue holding prefetched device batches."""
    import threading
    import time

    import jax

    from texttoaudiogrounding_tpu.parallel.mesh import device_feed, get_mesh
    from texttoaudiogrounding_tpu.training.runner_base import array_batch

    tok = DictTokenizer(data_dir["vocab"])
    ds = AudioPhraseDataset(str(data_dir["wav_csv"]),
                            str(data_dir["label"]), time_resolution=0.04)
    collate = TextCollate(tokenizer=tok, text_key="phrase",
                          pad_keys=["waveform", "label"],
                          pad_buckets={"waveform": 32000})
    batches = list(DataLoader(ds, batch_size=1, collate_fn=collate))
    assert len(batches) >= 3
    mesh = get_mesh(jax.devices()[:1])

    before = threading.active_count()
    it = device_feed(iter(batches * 4), mesh, 1, prepare=array_batch)
    next(it)
    it.close()  # GeneratorExit at the yield -> finally must reap
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_thread_loader_abandoned_iteration_stops_producer(data_dir):
    """Breaking out of a thread-mode DataLoader mid-epoch must stop the
    producer thread; the next epoch iterates fully."""
    import threading
    import time

    tok = DictTokenizer(data_dir["vocab"])
    ds = AudioPhraseDataset(str(data_dir["wav_csv"]),
                            str(data_dir["label"]), time_resolution=0.04)
    collate = TextCollate(tokenizer=tok, text_key="phrase",
                          pad_keys=["waveform", "label"])
    loader = DataLoader(ds, batch_size=1, collate_fn=collate,
                        num_workers=2, prefetch=1)
    before = threading.active_count()
    for batch in loader:
        break  # abandon with prefetched batches in flight
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(list(loader)) == len(ds)


def test_thread_loader_propagates_errors():
    """The default (thread) loader must re-raise dataset errors at the
    consumer instead of hanging forever on a missing sentinel."""
    loader = DataLoader(_BadDataset(), batch_size=4, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)
