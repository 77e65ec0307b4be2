"""Benchmark decontamination (stages/decontam.py): the GPT-3 13-gram
overlap recipe — planted contamination found, clean/short docs kept,
drop mode filters."""

import numpy as np
import pyarrow as pa

from gdal_ray.stages.decontam import (
    build_contamination_index,
    decontaminate,
    ngram_hashes,
)

BENCH = ("What is the capital of France Paris is the capital and "
         "largest city of France")


def _mk_corpus():
    words = [f"w{i}" for i in range(40)]
    clean = " ".join(words)
    # contaminated: the benchmark sentence embedded mid-document,
    # different CASE (normalization must catch it)
    dirty = ("intro text " + BENCH.upper() + " closing remarks "
             + " ".join(words[:15]))
    short = "too short to contaminate"
    return pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [clean, dirty, short],
    })


class TestNgramHashes:
    def test_short_doc_empty(self):
        assert len(ngram_hashes("one two three", n=13)) == 0

    def test_case_insensitive(self):
        a = ngram_hashes(BENCH, n=13)
        b = ngram_hashes(BENCH.upper(), n=13)
        assert (a == b).all() and len(a) > 0

    def test_window_count(self):
        t = " ".join(str(i) for i in range(20))
        assert len(ngram_hashes(t, n=13)) == 20 - 13 + 1


class TestDecontaminate:
    def test_flag_and_drop(self, ray_session):
        import ray.data as rd

        idx = build_contamination_index([BENCH], n=13)
        ds = rd.from_arrow(_mk_corpus())
        flagged = decontaminate(ds, idx, n=13).to_pandas() \
            .set_index("doc_id")
        assert not flagged.loc[1, "contaminated"]
        assert flagged.loc[2, "contaminated"]
        assert flagged.loc[2, "n_contaminated_ngrams"] > 0
        assert not flagged.loc[3, "contaminated"]

        kept = decontaminate(ds, idx, n=13, mode="drop").to_pandas()
        assert sorted(kept["doc_id"]) == [1, 3]

    def test_empty_index_all_clean(self, ray_session):
        import ray.data as rd

        idx = build_contamination_index([], n=13)
        out = decontaminate(rd.from_arrow(_mk_corpus()), idx).to_pandas()
        assert not out["contaminated"].any()
