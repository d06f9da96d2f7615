"""Stage-effect pins for curation v7 — paragraph-granularity curation.

The verdict's non-vacuity contract, pinned directly: a mixed en/ru
document KEEPS its English paragraphs while the DOCUMENT-level langid
argmax (v5/v6's gate) reads the same document as 'en' and would have
kept it whole, Russian quote included. Pins run on the EXACT synthesis
frames the registered query uses (_v7_synth_spark/_v7_train_spark), so
a drifted copy cannot make them vacuous.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magicxml_spark.queries.pipeline import (
    _V5_RU,
    _V7_MAX_SURPRISAL,
    _V7_POOL,
    _v7_synth_spark,
    _v7_train_spark,
    _snapshot_scratch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def v7(spark):
    """(synth, lm_path) — the registered query's exact inputs."""
    from magicxml_spark.operators.curation import write_lm_snapshot

    snap = _snapshot_scratch("v7test")
    write_lm_snapshot(_v7_train_spark(spark, SF), snap, order=2)
    return _v7_synth_spark(spark, SF).localCheckpoint(eager=True), snap


def _pool_text(d: int) -> str:
    return "\n\n".join(_V7_POOL[(d + s) % 4] for s in range(4))


def test_mixed_doc_keeps_en_paragraphs_v6_would_not(spark, v7):
    """THE contrast pin: doc 3 (d%3==0, no noisy/bomb) carries a full
    Russian paragraph. v7 drops exactly that paragraph; the
    document-level argmax v6 gates on reads the SAME document as 'en'
    — a doc-level pipeline would have kept the Russian text."""
    from magicxml_spark.operators.curation import paragraph_curation
    from magicxml_spark.operators.langid import with_lang

    synth, snap = v7
    doc3 = synth.filter(F.col("doc_id") == 3)
    assert _V5_RU in doc3.collect()[0].text
    # the v6-style doc-level verdict: 'en' (the quote is invisible)
    doclang = with_lang(doc3).select("lang").collect()[0].lang
    assert doclang == "en"
    out = paragraph_curation(
        doc3, snap, keep_lang="en", max_surprisal=_V7_MAX_SURPRISAL
    ).collect()[0]
    assert out.n_paras == 5 and out.n_kept == 4
    assert _V5_RU not in out.text_kept
    assert out.text_kept == _pool_text(3)


def test_noisy_paragraph_dies_on_surprisal_not_langid(spark, v7):
    """doc 4 (d%4==0): the OOV-dense paragraph reads as 'en' — only
    the frozen-LM gate can drop it."""
    from magicxml_spark.operators.curation import (
        paragraph_curation,
        paragraph_signals,
    )

    synth, snap = v7
    doc4 = synth.filter(F.col("doc_id") == 4)
    sig = {r.pos: r for r in paragraph_signals(doc4, snap).collect()}
    noisy = sig[2]  # pool, pool, noisy, pool, pool layout for d%4==0
    assert noisy.para.startswith("the zq")
    assert noisy.lang == "en"
    assert noisy.surprisal > _V7_MAX_SURPRISAL
    # clean paragraphs sit far below the gate
    assert sig[0].surprisal < _V7_MAX_SURPRISAL
    out = paragraph_curation(
        doc4, snap, keep_lang="en", max_surprisal=_V7_MAX_SURPRISAL
    ).collect()[0]
    assert out.n_paras == 5 and out.n_kept == 4
    assert "zq" not in out.text_kept


def test_bomb_survives_paragraph_gates_then_gopher_kills(spark, v7):
    """doc 9 (d%9==0): the repetition bomb is clean English with seen
    bigrams — both paragraph gates PASS it — and the reassembled doc
    then dies on Gopher's dup-ngram battery (the doc-level stack
    still bites after paragraph curation)."""
    from magicxml_spark.operators.curation import (
        gopher_quality,
        paragraph_curation,
    )

    synth, snap = v7
    doc9 = synth.filter(F.col("doc_id") == 9)
    out = paragraph_curation(
        doc9, snap, keep_lang="en", max_surprisal=_V7_MAX_SURPRISAL
    ).collect()[0]
    # d%9==0 implies d%3==0: the RU paragraph dropped, bomb kept
    assert out.n_paras == 6 and out.n_kept == 5
    assert _V7_POOL[1] + " " + _V7_POOL[1] in out.text_kept  # bomb intact
    gq = gopher_quality(
        spark.createDataFrame(
            [(9, out.text_kept)], "doc_id long, text string"
        )
    ).collect()[0]
    assert not gq.keep and gq.rep_flag


def test_clean_doc_reassembles_verbatim(spark, v7):
    """doc 1 (no residue class): all four pool paragraphs survive in
    order — paragraph curation is a no-op on clean documents."""
    from magicxml_spark.operators.curation import paragraph_curation

    synth, snap = v7
    out = paragraph_curation(
        synth.filter(F.col("doc_id") == 1),
        snap,
        keep_lang="en",
        max_surprisal=_V7_MAX_SURPRISAL,
    ).collect()[0]
    assert out.n_paras == 4 and out.n_kept == 4
    assert out.text_kept == _pool_text(1)


def test_registered_query_counts(spark):
    """End-to-end invariants at sf0.001: exactly the 56 bomb docs die
    (500 docs, d%9==0), every survivor keeps exactly its 4 clean
    paragraphs."""
    from magicxml_spark.queries import QUERIES

    rows = QUERIES["q_curation_v7"](spark, SF).collect()
    assert len(rows) == 444
    assert all(r.n_kept == 4 for r in rows)
    assert all(r.doc_id % 9 != 0 for r in rows)


def test_stream_paragraph_curation_equals_batch(spark, v7):
    """Stream == batch for the paragraph decision: the stateless
    per-micro-batch map must reproduce the batch operator row for row
    (fp included)."""
    from magicxml_spark.operators.curation import paragraph_curation
    from magicxml_spark.queries.pipeline import (
        _V7_MAX_SURPRISAL,
        _snapshot_scratch,
        _v7_synth_cols,
    )
    from magicxml_spark.streaming.lm import run_stream_paragraph_curation

    synth, snap = v7
    batch = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_kept)
        for r in paragraph_curation(
            synth, snap, keep_lang="en", max_surprisal=_V7_MAX_SURPRISAL
        ).collect()
    }
    import hashlib

    streamed = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_fp)
        for r in run_stream_paragraph_curation(
            spark,
            SF,
            snap,
            out_dir=_snapshot_scratch("para_cur_test"),
            keep_lang="en",
            max_surprisal=_V7_MAX_SURPRISAL,
            synth=lambda b: _v7_synth_cols(b.select("doc_id")),
        ).collect()
    }
    assert set(batch) == set(streamed)
    for d, (np_, nk, text) in batch.items():
        fp = hashlib.md5(text.encode("utf-8")).hexdigest()
        assert streamed[d] == (np_, nk, fp), f"doc {d}"
