"""Offline tooling: phrase parser, packing, label tools, clustering,
embeddings."""

import json
import pickle

import numpy as np
import pytest

from texttoaudiogrounding_tpu.tools.phrase_parser import (
    PhraseParser,
    extract_phrases,
    locate_phrase,
)


def test_phrase_parser_splits_conjunctions():
    parser = PhraseParser()
    assert parser("a dog barks while a man speaks") == \
        ["a dog barks", "a man speaks"]
    assert parser("rain falling followed by thunder") == \
        ["rain falling", "thunder"]
    # "and" before a comparative-like word does NOT split
    assert parser("a car revs and then accelerates faster") == \
        ["a car revs", "accelerates faster"]
    # "and" before an er-noun DOES split
    assert parser("dogs bark and thunder roars") == \
        ["dogs bark", "thunder roars"]
    # filler-only chunks dropped
    assert "is" not in parser("music is playing, birds chirp")


def test_locate_phrase():
    tokens = "a dog barks while a man speaks"
    assert locate_phrase(tokens, "a man speaks") == (4, 6)
    # ambiguous multi-occurrence phrase → (0, 0)
    assert locate_phrase("dog dog barking dog dog", "dog dog") == (0, 0)


def test_extract_phrases():
    items = [{"audiocap_id": 1, "audio_id": "Ya.wav",
              "tokens": "A dog barks while a man speaks."}]
    data = extract_phrases(items)
    assert data[0]["phrases"][0]["phrase"] == "a dog barks"
    assert data[0]["phrases"][1]["start_index"] == 4


def test_pack_waveform_roundtrip(tmp_path):
    from scipy.io import wavfile

    from texttoaudiogrounding_tpu.data.h5io import read_from_h5
    from texttoaudiogrounding_tpu.tools.pack_waveform import (
        pack_waveform,
        prepare_duration,
        prepare_wav_csv,
    )

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        data = (rng.normal(size=16000) * 3000).astype(np.int16)
        wavfile.write(wav_dir / f"clip{i}.wav", 16000, data)
    prepare_wav_csv(str(wav_dir), str(tmp_path / "wav.csv"))
    pack_waveform(str(tmp_path / "wav.csv"), str(tmp_path / "waveform.h5"),
                  sample_rate=32000, num_workers=2)
    # packed float16 at 32 kHz (resampled 2x)
    wav = read_from_h5("clip0.wav", str(tmp_path / "waveform.h5"))
    assert wav.dtype == np.float16
    assert wav.shape[0] == 32000
    prepare_duration(str(tmp_path / "waveform.csv"),
                     str(tmp_path / "dur.csv"))
    import pandas as pd
    dur = pd.read_csv(tmp_path / "dur.csv", sep="\t")
    assert np.allclose(dur["duration"], 1.0)


def test_label_tools(tmp_path):
    from texttoaudiogrounding_tpu.tools.label_tools import (
        calc_phrase_count,
        concat_label,
        exclude_overlap_with_test,
        filter_non_trivial_samples,
        sample_subset_by_frac,
    )

    items = [
        {"audio_id": "a", "phrases": [
            {"phrase": "dog", "segments": [[0.0, 9.95]]},
            {"phrase": "cat", "segments": [[1.0, 2.0]]}]},
        {"audio_id": "b", "phrases": [
            {"phrase": "dog", "segments": [[0.0, 1.0]]}]},
    ]
    json.dump(items, open(tmp_path / "l.json", "w"))
    json.dump(items[:1], open(tmp_path / "test.json", "w"))
    with open(tmp_path / "dur.csv", "w") as f:
        f.write("audio_id\tduration\na\t10.0\nb\t10.0\n")

    concat_label([str(tmp_path / "l.json")] * 2, str(tmp_path / "c.json"))
    assert len(json.load(open(tmp_path / "c.json"))) == 4

    calc_phrase_count(str(tmp_path / "l.json"), str(tmp_path / "cnt.json"))
    assert json.load(open(tmp_path / "cnt.json")) == {"dog": 2, "cat": 1}

    sample_subset_by_frac(str(tmp_path / "c.json"),
                          str(tmp_path / "s.json"), 0.5)
    assert len(json.load(open(tmp_path / "s.json"))) == 2

    filter_non_trivial_samples(str(tmp_path / "l.json"),
                               str(tmp_path / "f.json"),
                               str(tmp_path / "dur.csv"))
    filtered = json.load(open(tmp_path / "f.json"))
    # the 99.5%-coverage "dog" phrase of audio a is dropped
    assert [p["phrase"] for p in filtered[0]["phrases"]] == ["cat"]

    exclude_overlap_with_test(str(tmp_path / "l.json"),
                              str(tmp_path / "test.json"),
                              str(tmp_path / "e.json"))
    assert [it["audio_id"] for it in
            json.load(open(tmp_path / "e.json"))] == ["b"]


def test_clustering_and_mapping(tmp_path, rng):
    from texttoaudiogrounding_tpu.tools.clustering import kmeans
    from texttoaudiogrounding_tpu.tools.map_phrase_to_event import \
        map_phrases

    phrases = {f"phrase {i}": rng.normal(size=8).astype(np.float32)
               for i in range(20)}
    pickle.dump(phrases, open(tmp_path / "pe.pkl", "wb"))
    kmeans(str(tmp_path / "pe.pkl"), str(tmp_path / "km"), n_clusters=3)
    files = list((tmp_path / "km").glob("*.json"))
    assert files
    cmap = json.load(open(files[0]))
    assert sum(len(v) for v in cmap.values()) == 20

    labels = {"Dog": rng.normal(size=8).astype(np.float32),
              "Cat": rng.normal(size=8).astype(np.float32)}
    pickle.dump(labels, open(tmp_path / "le.pkl", "wb"))
    map_phrases(str(tmp_path / "pe.pkl"), str(tmp_path / "le.pkl"),
                str(tmp_path / "map.json"), topk=1)
    mapping = json.load(open(tmp_path / "map.json"))
    assert len(mapping) == 20
    assert mapping["phrase 0"][0][0] in ("Dog", "Cat")


def test_word2vec_binary_reader(tmp_path):
    from texttoaudiogrounding_tpu.tools.embeddings import (
        build_vocab_embedding_matrix,
        read_word2vec_binary,
    )
    from texttoaudiogrounding_tpu.data.vocabulary import Vocabulary

    # write a tiny word2vec .bin
    words = {"dog": np.arange(4, dtype=np.float32),
             "cat": np.ones(4, np.float32)}
    with open(tmp_path / "w2v.bin", "wb") as f:
        f.write(f"{len(words)} 4\n".encode())
        for word, vec in words.items():
            f.write(word.encode() + b" " + vec.tobytes())
    got = read_word2vec_binary(str(tmp_path / "w2v.bin"))
    np.testing.assert_array_equal(got["dog"], [0, 1, 2, 3])

    vocab = Vocabulary()
    for w in ("<pad>", "<unk>", "dog", "zebra"):
        vocab.add_word(w)
    vocab.save(tmp_path / "vocab.pkl")
    matrix = build_vocab_embedding_matrix(
        str(tmp_path / "vocab.pkl"), str(tmp_path / "w2v.bin"),
        str(tmp_path / "emb.npy"))
    assert matrix.shape == (4, 4)
    np.testing.assert_array_equal(matrix[2], [0, 1, 2, 3])  # dog hit
    assert matrix[3].any()  # zebra got a random vector


def test_phrase_embedding_extraction(tmp_path):
    from texttoaudiogrounding_tpu.tools.embeddings import \
        extract_phrase_embeddings

    items = [{"audio_id": "a", "phrases": ["dog barking", "cat meowing"]}]
    json.dump(items, open(tmp_path / "l.json", "w"))
    extract_phrase_embeddings([str(tmp_path / "l.json")],
                              str(tmp_path / "pe.pkl"), encoder="clap")
    embs = pickle.load(open(tmp_path / "pe.pkl", "rb"))
    assert set(embs) == {"dog barking", "cat meowing"}
    assert np.isfinite(embs["dog barking"]).all()


def test_oov_lemma_and_spellfix(tmp_path):
    """The OOV pipeline mirrors the reference resolution order
    (utils/word2vec/load_pretrained.py:23-152): exact → lowercase →
    rule-based lemma → edit-1 spell fix → mean 'unknown' vector."""
    from texttoaudiogrounding_tpu.data.vocabulary import Vocabulary
    from texttoaudiogrounding_tpu.tools.embeddings import (
        build_vocab_embedding_matrix,
        edit1_candidates,
        lemma_candidates,
    )

    assert "run" in lemma_candidates("running")
    assert "bark" in lemma_candidates("barking")
    assert "whistle" in lemma_candidates("whistling")
    assert "dog" in lemma_candidates("dogs")
    assert "wave" in lemma_candidates("waved")
    assert "city" in lemma_candidates("cities")
    assert "dog" in edit1_candidates("dgo")     # transpose
    assert "dog" in edit1_candidates("dogg")    # delete

    vecs = {"dog": np.full(4, 1, np.float32),
            "bark": np.full(4, 2, np.float32),
            "meow": np.full(4, 3, np.float32)}
    with open(tmp_path / "w2v.bin", "wb") as f:
        f.write(f"{len(vecs)} 4\n".encode())
        for word, vec in vecs.items():
            f.write(word.encode() + b" " + vec.tobytes())

    vocab = Vocabulary()
    for w in ("<pad>", "<unk>", "Dog", "barking", "meoww", "qqqq"):
        vocab.add_word(w)
    vocab.save(tmp_path / "vocab.pkl")
    matrix = build_vocab_embedding_matrix(
        str(tmp_path / "vocab.pkl"), str(tmp_path / "w2v.bin"),
        str(tmp_path / "emb.npy"))
    np.testing.assert_array_equal(matrix[2], vecs["dog"])    # lowercase
    np.testing.assert_array_equal(matrix[3], vecs["bark"])   # lemma
    np.testing.assert_array_equal(matrix[4], vecs["meow"])   # spell fix
    # total miss → mean of loaded vectors
    np.testing.assert_allclose(matrix[5], np.full(4, 2.0), rtol=1e-6)


def test_calc_phrase_sim_count(tmp_path):
    import json
    import pickle

    from texttoaudiogrounding_tpu.tools.label_tools import (
        calc_phrase_sim_count)

    counts = {"a dog barks": 3, "dog barking": 5, "water runs": 7}
    embs = {"a dog barks": np.array([1.0, 0.0]),
            "dog barking": np.array([0.9, 0.1]),
            "water runs": np.array([0.0, 1.0])}
    json.dump(counts, open(tmp_path / "counts.json", "w"))
    pickle.dump(embs, open(tmp_path / "embs.pkl", "wb"))
    calc_phrase_sim_count(str(tmp_path / "counts.json"),
                          str(tmp_path / "embs.pkl"),
                          str(tmp_path / "out.json"), threshold=0.5)
    got = json.load(open(tmp_path / "out.json"))
    # dog phrases are mutually similar (cos≈0.99), water is orthogonal
    assert got == {"a dog barks": 8, "dog barking": 8, "water runs": 7}


def test_greedy_bertscore_identity_and_orthogonal():
    from texttoaudiogrounding_tpu.tools.score_backends import (
        greedy_bertscore)

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5, 8))
    mask = np.array([False, True, True, True, False])  # specials stripped
    p, r, f1 = greedy_bertscore(emb, mask, emb, mask)
    assert p == pytest.approx(1.0) and f1 == pytest.approx(1.0)
    # orthogonal tokens -> low score
    other = np.concatenate([np.zeros((5, 8)), rng.normal(size=(5, 8))],
                           axis=1)
    this = np.concatenate([rng.normal(size=(5, 8)), np.zeros((5, 8))],
                          axis=1)
    _, _, f1o = greedy_bertscore(this, mask, other, mask)
    assert f1o < 0.2


def test_greedy_bertscore_hand_golden():
    """Hand-derived values from a fixed tiny embedding table (no engine
    in the loop): cand {(1,0), (.6,.8)} vs ref {(0,1), (1,0)} gives the
    greedy sim matrix [[0, 1], [.8, .6]] -> P = mean(1, .8) = .9,
    R = mean(max(0,.8), max(1,.6)) = .9, F1 = .9; a one-token candidate
    against a two-token reference gives P=1, R=.5, F1=2/3."""
    from texttoaudiogrounding_tpu.tools.score_backends import (
        greedy_bertscore)

    mask2 = np.array([True, True])
    cand = np.array([[1.0, 0.0], [0.6, 0.8]])
    ref = np.array([[0.0, 1.0], [1.0, 0.0]])
    p, r, f1 = greedy_bertscore(cand, mask2, ref, mask2)
    assert p == pytest.approx(0.9)
    assert r == pytest.approx(0.9)
    assert f1 == pytest.approx(0.9)

    one = np.array([[2.0, 0.0]])          # non-unit norm: must normalize
    p, r, f1 = greedy_bertscore(one, np.array([True]), ref, mask2)
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(0.5)
    assert f1 == pytest.approx(2 / 3)


def test_bertscore_matrix_picks_shared_word_label():
    """With a bag-of-words encoder, the label sharing tokens with the
    phrase must win the argmax (the mapping semantics the reference
    gets from bert_score)."""
    from texttoaudiogrounding_tpu.tools.score_backends import (
        bertscore_matrix)

    vocab = {}
    rng = np.random.default_rng(1)

    def encode(texts):
        ln = max(len(t.split()) for t in texts) + 2
        emb = np.zeros((len(texts), ln, 16))
        mask = np.zeros((len(texts), ln), bool)
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()):
                if w not in vocab:
                    vocab[w] = rng.normal(size=16)
                emb[i, j + 1] = vocab[w]
                mask[i, j + 1] = True
        return emb, mask

    phrases = ["a dog barks loudly", "water is running"]
    labels = ["dog", "water", "speech"]
    mat = bertscore_matrix(phrases, labels, encode)
    assert mat.shape == (2, 3)
    assert mat[0].argmax() == 0 and mat[1].argmax() == 1


def test_prepare_phrase_mapping_cli(tmp_path):
    """End-to-end TSV output in the reference prepare_phrase_bertscore
    format, both backends, over the native tower (random weights)."""
    import json

    import pandas as pd

    from texttoaudiogrounding_tpu.tools.score_backends import (
        prepare_phrase_mapping)

    data = [{"audio_id": "a", "phrases": [{"phrase": "a dog barks"},
                                          {"phrase": "water running"}]}]
    json.dump(data, open(tmp_path / "label.json", "w"))
    json.dump(["dog", "water"], open(tmp_path / "labels.json", "w"))
    for backend in ("bertscore", "bleurt"):
        out = tmp_path / f"{backend}.tsv"
        prepare_phrase_mapping(str(tmp_path / "label.json"), str(out),
                               str(tmp_path / "labels.json"),
                               backend=backend)
        df = pd.read_csv(out, sep="\t")
        assert list(df.columns) == ["phrase", "index", "sim"]
        assert len(df) == 2 and df["index"].isin([0, 1]).all()
