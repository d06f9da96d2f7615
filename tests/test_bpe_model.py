"""Frozen BPE tokenizer artifact (VERDICT r11 #3): write/load/apply
lifecycle for char- and byte-level merge tables, pinned against the
in-memory apply paths."""

from __future__ import annotations

import pytest

from magicxml_spark.operators.text import (
    BPE_MAX_COMPILED_MERGES,
    bpe_apply,
    bpe_apply_bytes_pandas,
    bpe_apply_from_model,
    bpe_apply_pandas,
    bpe_train,
    bpe_train_bytes,
    read_bpe_model,
    write_bpe_model,
)

TEXTS = [
    "the cat sat on the mat",
    "the mats that the cats sat on",
    "Привет the dog саt",
    "that cat is the best cat of the cats",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_char_model_roundtrip_and_apply(spark, tmp_path):
    docs = _docs(spark)
    merges = bpe_train(docs, max_merges=10)
    assert merges  # non-vacuous
    path = str(tmp_path / "char_model")
    meta = write_bpe_model(spark, merges, path, level="char")
    assert meta == {"level": "char", "n_merges": len(merges)}
    loaded, level = read_bpe_model(spark, path)
    assert loaded == merges and level == "char"
    from_model = {
        r.doc_id: r for r in bpe_apply_from_model(docs, path).collect()
    }
    in_memory = {
        r.doc_id: r for r in bpe_apply(docs, merges=merges).collect()
    }
    assert from_model == in_memory


def test_char_model_with_counts_strips_counts_on_read(spark, tmp_path):
    docs = _docs(spark)
    merges3 = bpe_train(docs, max_merges=6, with_counts=True)
    path = str(tmp_path / "counted_model")
    write_bpe_model(spark, merges3, path, level="char")
    loaded, _ = read_bpe_model(spark, path)
    assert loaded == [(a, b) for a, b, _c in merges3]
    # pair_count survives in the parquet for auditing
    import os

    counts = (
        spark.read.parquet(os.path.join(path, "merges"))
        .orderBy("rank")
        .collect()
    )
    assert [r.pair_count for r in counts] == [c for _a, _b, c in merges3]


def test_bytes_model_roundtrip_and_apply(spark, tmp_path):
    docs = _docs(spark)
    merges = bpe_train_bytes(docs, max_merges=12)
    assert merges
    path = str(tmp_path / "bytes_model")
    write_bpe_model(spark, merges, path, level="bytes")
    loaded, level = read_bpe_model(spark, path)
    assert loaded == merges and level == "bytes"
    from_model = {
        r.doc_id: r for r in bpe_apply_from_model(docs, path).collect()
    }
    in_memory = {
        r.doc_id: r
        for r in bpe_apply_bytes_pandas(docs, merges=merges).collect()
    }
    assert from_model == in_memory
    # byte-level output schema (n_pretokens, not n_words)
    assert "n_pretokens" in from_model[0].asDict()


def test_big_char_table_dispatches_to_arrow_loop(spark, tmp_path):
    # past the analyzer nesting bound the char arm must fall back to
    # the Arrow loop with identical output
    docs = _docs(spark)
    filler = [(f"Q{i}", f"Z{i}") for i in range(BPE_MAX_COMPILED_MERGES)]
    merges = bpe_train(docs, max_merges=4) + filler
    assert len(merges) > BPE_MAX_COMPILED_MERGES
    path = str(tmp_path / "big_model")
    write_bpe_model(spark, merges, path, level="char")
    from_model = {
        r.doc_id: r for r in bpe_apply_from_model(docs, path).collect()
    }
    in_memory = {
        r.doc_id: r
        for r in bpe_apply_pandas(docs, merges=merges).collect()
    }
    assert from_model == in_memory


def test_model_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="level"):
        write_bpe_model(spark, [("a", "b")], str(tmp_path / "x"), level="word")
    # corrupt artifact: meta/merges disagree
    path = str(tmp_path / "corrupt")
    write_bpe_model(spark, [("a", "b"), ("c", "d")], path, level="char")
    import os

    spark.createDataFrame([("char", 5)], "level string, n_merges int").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "meta"))
    with pytest.raises(ValueError, match="corrupt"):
        read_bpe_model(spark, path)
