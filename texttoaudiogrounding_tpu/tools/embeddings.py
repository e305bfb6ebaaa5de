"""Phrase / label embedding extraction + word2vec matrix building.

Reference: utils/data/create_text_embedding/prepare_phrase_clap.py (CLAP
text tower → {phrase: emb} pickle), prepare_phrase_sbert.py, and
utils/word2vec/load_pretrained.py (GoogleNews word2vec → per-vocab-word
embedding matrix ``.npy`` consumed by EmbeddingLayer).

gensim is not available in this image, so the word2vec binary format is
read directly (it is a simple header + packed float32 records).
"""

from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def read_word2vec_binary(path: str, restrict_vocab: set | None = None
                         ) -> dict[str, np.ndarray]:
    """Read a word2vec .bin file (GoogleNews format) into {word: vec}."""
    vectors: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8")
        vocab_size, dim = map(int, header.split())
        record = np.dtype(np.float32).itemsize * dim
        for _ in range(vocab_size):
            chars = []
            while True:
                ch = f.read(1)
                if ch == b" ":
                    break
                if ch != b"\n":
                    chars.append(ch)
            word = b"".join(chars).decode("utf-8", errors="replace")
            vec = np.frombuffer(f.read(record), dtype=np.float32)
            if restrict_vocab is None or word in restrict_vocab:
                vectors[word] = vec
    return vectors


def build_vocab_embedding_matrix(vocab_path: str, word2vec_bin: str,
                                 output: str,
                                 embed_dim: int | None = None,
                                 seed: int = 0) -> np.ndarray:
    """vocab pickle + word2vec .bin → ``[V, D]`` embedding matrix ``.npy``.

    OOV words get random normal vectors (the reference additionally
    lemmatizes/spell-fixes via spacy/symspell, utils/word2vec/
    load_pretrained.py:23-152 — those packages are absent here; simple
    lowercase fallback is applied instead).
    """
    from texttoaudiogrounding_tpu.data.vocabulary import Vocabulary
    vocab = Vocabulary.load(vocab_path)
    words = [vocab.idx2word[i] for i in range(len(vocab))]
    vectors = read_word2vec_binary(word2vec_bin,
                                   restrict_vocab=set(words)
                                   | {w.lower() for w in words})
    dim = embed_dim or (len(next(iter(vectors.values())))
                        if vectors else 300)
    rng = np.random.default_rng(seed)
    matrix = np.zeros((len(words), dim), np.float32)
    hit = 0
    for i, word in enumerate(words):
        vec = vectors.get(word, vectors.get(word.lower()))
        if vec is not None and len(vec) == dim:
            matrix[i] = vec
            hit += 1
        else:
            matrix[i] = rng.normal(scale=0.1, size=dim)
    np.save(output, matrix)
    print(f"embedding matrix [{len(words)}, {dim}], "
          f"{hit}/{len(words)} from word2vec → {output}")
    return matrix


def _collect_phrases(label_files: list[str]) -> list[str]:
    phrases = set()
    for path in label_files:
        with open(path) as f:
            for item in json.load(f):
                for phrase in item["phrases"]:
                    phrases.add(phrase if isinstance(phrase, str)
                                else phrase["phrase"])
    return sorted(phrases)


def extract_phrase_embeddings(label_files: list[str], output: str,
                              encoder: str = "clap",
                              checkpoint: str | None = None,
                              tokenizer_name: str | None = None,
                              batch_size: int = 64) -> None:
    """Encode every phrase with a text tower → {phrase: emb} pickle.

    ``encoder``: "clap" (ClapTextEncoder, projection + L2 norm — reference
    prepare_phrase_clap.py:51-207) or "sbert" (mean pooling — reference
    prepare_phrase_sbert.py).  ``checkpoint``: local HF torch checkpoint
    dir; without one, a randomly-initialized tiny tower is used (useful
    only for pipeline tests).
    """
    import jax

    from texttoaudiogrounding_tpu.models.pretrained_text import (
        ClapTextEncoder,
        SentenceBert,
        config_from_hf,
        import_clap_text_params,
        import_hf_bert_params,
        tiny_text_tower_config,
    )

    phrases = _collect_phrases(label_files)

    if checkpoint is not None:
        import torch
        from transformers import AutoConfig, AutoTokenizer
        hf_cfg = AutoConfig.from_pretrained(checkpoint)
        text_cfg = config_from_hf(getattr(hf_cfg, "text_config", hf_cfg))
        tok = AutoTokenizer.from_pretrained(tokenizer_name or checkpoint)
        state = torch.load(Path(checkpoint) / "pytorch_model.bin",
                           map_location="cpu")
        if encoder == "clap":
            model = ClapTextEncoder(text_cfg)
            params = {"params": import_clap_text_params(state, text_cfg)}
        else:
            model = SentenceBert(text_cfg)
            params = {"params": {"tower": import_hf_bert_params(
                state, text_cfg)}}

        def tokenize(batch):
            out = tok(batch, padding=True, truncation=True,
                      return_tensors="np")
            return {k: np.asarray(v) for k, v in out.items()}
    else:
        text_cfg = tiny_text_tower_config(vocab_size=10000)
        model = (ClapTextEncoder(text_cfg) if encoder == "clap"
                 else SentenceBert(text_cfg))
        params = None

        def tokenize(batch):
            ids = [[hash(w) % 9999 + 1 for w in p.split()][:16] or [1]
                   for p in batch]
            max_len = max(len(x) for x in ids)
            input_ids = np.zeros((len(ids), max_len), np.int32)
            mask = np.zeros((len(ids), max_len), np.int32)
            for i, x in enumerate(ids):
                input_ids[i, :len(x)] = x
                mask[i, :len(x)] = 1
            return {"input_ids": input_ids, "attention_mask": mask}

    apply = jax.jit(lambda v, b: model.apply(v, b, train=False)["seq_emb"])
    phrase_to_emb = {}
    for start in range(0, len(phrases), batch_size):
        batch = phrases[start:start + batch_size]
        tokens = tokenize(batch)
        if params is None:
            params = model.init({"params": jax.random.PRNGKey(0)}, tokens)
        embs = np.asarray(apply(params, tokens))
        for phrase, emb in zip(batch, embs):
            phrase_to_emb[phrase] = emb
    with open(output, "wb") as f:
        pickle.dump(phrase_to_emb, f)
    print(f"wrote {len(phrase_to_emb)} phrase embeddings to {output}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("w2v_matrix")
    p.add_argument("vocab")
    p.add_argument("word2vec_bin")
    p.add_argument("output")
    p = sub.add_parser("phrase_emb")
    p.add_argument("labels", nargs="+")
    p.add_argument("--output", required=True)
    p.add_argument("--encoder", default="clap", choices=["clap", "sbert"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tokenizer", default=None)
    args = ap.parse_args()
    if args.cmd == "w2v_matrix":
        build_vocab_embedding_matrix(args.vocab, args.word2vec_bin,
                                     args.output)
    elif args.cmd == "phrase_emb":
        extract_phrase_embeddings(args.labels, args.output, args.encoder,
                                  args.checkpoint, args.tokenizer)


if __name__ == "__main__":
    main()
