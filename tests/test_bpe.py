"""Byte-level BPE (stages/bpe.py): the classic worked example,
roundtrip, determinism, and the distributed encode stage."""

import numpy as np
import pytest

from gdal_ray.stages.bpe import (
    BPETokenizer,
    bpe_decode,
    bpe_encode,
    train_bpe,
    train_bpe_on_dataset,
)


class TestTrain:
    def test_classic_example(self):
        # Sennrich's canonical corpus "aaabdaaabac": first merge is
        # (a,a) -> 256; the sequence becomes Z a b d Z a b a c where
        # (Z,a) and (a,b) tie at count 2 — the deterministic
        # lexicographic tie-break picks (a,b) -> 257
        merges = train_bpe(["aaabdaaabac"], n_merges=3)
        a, b = ord("a"), ord("b")
        assert merges[0] == (a, a)
        assert merges[1] == (a, b)
        # Z ab d Z ab a c -> (256, 257) "aaab" is now the best pair
        assert merges[2] == (256, 257)
        ids = bpe_encode("aaabdaaabac", {tuple(p): i
                                         for i, p in enumerate(merges)})
        assert bpe_decode(ids, merges) == "aaabdaaabac"
        # aaab d aaab a c = 5 tokens
        assert len(ids) == 5

    def test_deterministic(self):
        corpus = ["the quick brown fox", "the lazy dog", "the the the"]
        assert train_bpe(corpus, 50) == train_bpe(corpus, 50)

    def test_roundtrip_unicode(self):
        corpus = ["héllo wörld ☂ héllo", "wörld wörld"]
        merges = train_bpe(corpus, 40)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for t in corpus + ["unseen ☂ text héllo"]:
            assert bpe_decode(bpe_encode(t, ranks), merges) == t

    def test_compression(self):
        corpus = ["abcabcabc " * 20]
        merges = train_bpe(corpus, 30)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        ids = bpe_encode(corpus[0], ranks)
        assert len(ids) < len(corpus[0]) / 3


class TestStage:
    def test_distributed_encode(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id", "text"])
        merges = train_bpe_on_dataset(ds, n_merges=128)
        out = ds.map_batches(
            BPETokenizer(merges, ids_col="bpe_tokens"),
            batch_format="pyarrow").to_pandas()
        assert len(out) == 500
        assert (out["n_bpe_tokens"] > 0).all()
        # BPE compresses the templated corpus well below byte length
        byte_lens = out["text"].str.encode("utf-8").str.len()
        assert (out["n_bpe_tokens"] < byte_lens).all()
        # decode roundtrip on a sampled row
        row = out.iloc[7]
        assert bpe_decode(list(row["bpe_tokens"]), merges) == row["text"]
