"""Stage-effect pins for curation v8 — the FineWeb stack at paragraph
granularity. The load-bearing delta vs v6: embedded-foreign documents
SURVIVE minus their foreign paragraphs (v6's doc-level gate killed the
whole class), pinned on the exact synthesis frame the registered query
runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magicxml_spark.plans.gating import gate_on_computed
from magicxml_spark.queries.pipeline import (
    _V5_RU,
    _V6_MIN_SCORE,
    _v8_synth_spark,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def v8(spark):
    """(synth, cur) — the registered query's synthesis and its
    paragraph-curation stage output."""
    from magicxml_spark.operators.curation import paragraph_curation

    synth = _v8_synth_spark(spark, SF).localCheckpoint(eager=True)
    cur = paragraph_curation(
        synth, None, keep_lang="en", min_score=_V6_MIN_SCORE, max_chars=1000
    ).localCheckpoint(eager=True)
    return synth, cur


def test_embedded_ru_doc_survives_minus_its_quote(spark, v8):
    """doc 13 (d%10==3): en body + embedded RU paragraph. v6's
    doc-level class killed these whole; v8 drops exactly the quote."""
    synth, cur = v8
    assert _V5_RU in synth.filter(F.col("doc_id") == 13).collect()[0].text
    r = cur.filter(F.col("doc_id") == 13).collect()[0]
    assert r.n_paras == 4 and r.n_kept == 3
    assert _V5_RU not in r.text_kept
    assert r.text_kept != ""


def test_score_gated_doc_empties_at_paragraph_level(spark, v8):
    """doc 11 (d%10==1): every paragraph's en evidence sits below the
    0.05 score gate -> 'und' -> the doc reassembles EMPTY (v6 killed
    it with the doc-level score gate; same verdict, paragraph
    spelling)."""
    _, cur = v8
    r = cur.filter(F.col("doc_id") == 11).collect()[0]
    assert r.n_paras == 3 and r.n_kept == 0 and r.text_kept == ""


def test_gate_stage_survivor_classes(spark, v8):
    """Through Gopher+FineWeb: the embedded-RU class SURVIVES (45 docs
    at sf0.001 — the v8-vs-v6 delta), while the bomb (%9), score-gate
    (%10==1), listy (%10==6) and full-DE (%10==7) classes are all
    dead."""
    from magicxml_spark.operators.curation import (
        fineweb_quality,
        gopher_quality,
    )

    _, cur = v8
    kept = cur.select(
        "doc_id", F.col("text_kept").alias("text")
    ).localCheckpoint(eager=True)
    gated = kept.join(
        gate_on_computed(
            gopher_quality(kept), ["doc_id", "keep"], F.col("keep")
        ).select("doc_id"),
        "doc_id",
    )
    fw = gated.join(
        gate_on_computed(
            fineweb_quality(gated), ["doc_id", "keep"], F.col("keep")
        ).select("doc_id"),
        "doc_id",
    )
    ids = sorted(r.doc_id for r in fw.select("doc_id").collect())
    assert len(ids) == 311
    assert len([d for d in ids if d % 10 == 3]) == 45
    assert not [d for d in ids if d % 9 == 0 or d % 10 in (1, 6, 7)]


def test_registered_query_final_output(spark):
    """End-to-end: DSIR selects 100 docs, none from a killed class;
    packing tiles each doc's tokens exactly."""
    from magicxml_spark.queries import QUERIES

    rows = QUERIES["q_curation_v8"](spark, SF).collect()
    ids = {r.doc_id for r in rows}
    assert len(ids) == 100
    assert not [d for d in ids if d % 9 == 0 or d % 10 in (1, 6, 7)]
    # per-doc segments tile [0, n_tokens)
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r.doc_from)
        pos = 0
        for s in segs:
            assert s.doc_from == pos
            pos += s.seg_len
        assert pos == segs[0].n_tokens
