"""Semantic pins for paragraph-granularity curation (VERDICT r11 #1).

The non-vacuity contract from the verdict: a mixed en/ru document
KEEPS its English paragraphs (v5/v6's document-level gate would have
killed or kept it whole), and a fluent-looking but OOV-dense English
paragraph dies on the frozen-LM surprisal gate while clean paragraphs
survive. All pins are hand-reasoned (the engine-vs-engine-parity
blind-spot rule), not parity echoes.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from magicxml_spark.operators.curation import (
    paragraph_curation,
    paragraph_signals,
    write_lm_snapshot,
)

EN_A = "the cat sat on the mat and it was happy to be here"
EN_B = "we can see that the story of the house is a good one"
RU = "Наименование товара и цена не указаны на складе никак"
# English function words (langid says 'en') + OOV gibberish: the
# surprisal gate's target. 4 known words, 8 OOV.
NOISY = "the zqa zqb zqc of zqd zqe and zqf zqg in zqh"


@pytest.fixture(scope="module")
def lm_snap(spark, tmp_path_factory):
    """Frozen bigram LM trained on the two clean sentences, 8 copies
    each (all their bigrams seen with count 8)."""
    path = str(tmp_path_factory.mktemp("pc") / "lm2")
    train = spark.createDataFrame(
        [(i, EN_A if i % 2 == 0 else EN_B) for i in range(16)],
        "doc_id long, text string",
    )
    write_lm_snapshot(train, path, order=2)
    return path


def test_signals_label_language_and_surprisal(spark, lm_snap):
    docs = spark.createDataFrame(
        [(1, EN_A + "\n\n" + RU + "\n\n" + EN_B)],
        "doc_id long, text string",
    )
    rows = {
        r.pos: r
        for r in paragraph_signals(docs, lm_snap).collect()
    }
    assert [rows[i].lang for i in range(3)] == ["en", "ru", "en"]
    # clean paragraphs: every bigram seen -> low surprisal; the RU
    # paragraph is all-OOV for the en-trained LM -> far higher
    assert rows[0].surprisal < 3.0
    assert rows[2].surprisal < 3.0
    assert rows[1].surprisal > 5.0
    assert rows[0].para == EN_A


def test_signals_tokenfree_paragraph_has_null_surprisal(spark, lm_snap):
    docs = spark.createDataFrame(
        [(1, EN_A + "\n\n\n\n" + EN_B)], "doc_id long, text string"
    )
    # the middle paragraph is "" (two seps back to back): no tokens,
    # no scoring row -> NULL surprisal, lang 'und'
    rows = {r.pos: r for r in paragraph_signals(docs, lm_snap).collect()}
    assert rows[1].lang == "und"
    assert rows[1].surprisal is None
    assert rows[1].n_tokens is None


def test_mixed_doc_keeps_english_paragraphs(spark, lm_snap):
    """THE verdict pin: en/ru mixed doc keeps its en paragraphs."""
    docs = spark.createDataFrame(
        [
            (1, EN_A + "\n\n" + RU + "\n\n" + EN_B),
            (2, EN_A + "\n\n" + EN_B),
            (3, RU),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in paragraph_curation(docs, lm_snap, keep_lang="en").collect()
    }
    assert out[1].n_paras == 3 and out[1].n_kept == 2
    assert out[1].text_kept == EN_A + "\n\n" + EN_B  # order preserved
    assert out[2].n_paras == 2 and out[2].n_kept == 2
    assert out[2].text_kept == EN_A + "\n\n" + EN_B
    # all-foreign doc: every paragraph dropped, empty rebuild
    assert out[3].n_kept == 0 and out[3].text_kept == ""


def test_surprisal_gate_drops_oov_dense_paragraph(spark, lm_snap):
    docs = spark.createDataFrame(
        [(1, EN_A + "\n\n" + NOISY + "\n\n" + EN_B)],
        "doc_id long, text string",
    )
    # sanity: the noisy paragraph PASSES the langid gate (it reads as
    # English) — only the LM gate can catch it
    sig = {r.pos: r for r in paragraph_signals(docs, lm_snap).collect()}
    assert sig[1].lang == "en"
    # without the surprisal gate it survives
    loose = paragraph_curation(docs, lm_snap, keep_lang="en").collect()[0]
    assert loose.n_kept == 3
    # with the gate it dies and the clean paragraphs survive
    tight = paragraph_curation(
        docs, lm_snap, keep_lang="en", max_surprisal=4.0
    ).collect()[0]
    assert tight.n_kept == 2
    assert tight.text_kept == EN_A + "\n\n" + EN_B


def test_surprisal_threshold_is_principled(spark, lm_snap):
    """The 4.0-nat threshold is not magic: clean-paragraph surprisal
    is bounded by the trained bigram ratios (every bigram seen), while
    an OOV token costs at least ln(N / (1 - lam)) nats — compute both
    sides from the snapshot and check the separation brackets the
    threshold."""
    import os

    meta = spark.read.parquet(os.path.join(lm_snap, "meta")).first()
    n_total = meta["n_total"]
    oov_nats = math.log(n_total / 0.25)
    assert oov_nats > 4.0  # a single OOV token already exceeds the gate
    docs = spark.createDataFrame(
        [(1, EN_A), (2, NOISY)], "doc_id long, text string"
    )
    sig = {r.doc_id: r for r in paragraph_signals(docs, lm_snap).collect()}
    assert sig[1].surprisal < 4.0 < sig[2].surprisal


def test_null_and_empty_text_degenerate(spark, lm_snap):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in paragraph_curation(docs, lm_snap).collect()
    }
    # null coalesces to "": one empty paragraph, lang 'und', dropped
    for i in (1, 2):
        assert out[i].n_paras == 1
        assert out[i].n_kept == 0
        assert out[i].text_kept == ""


def test_quality_paragraphs_drops_spam_generalizing_to_test_half(spark):
    """Paragraph classifier pin: doc 3 (odd — NOT in the training
    half) carries the d%3 spam paragraph; the trained model must
    generalize and drop exactly it. Doc 12 carries both spam variants
    (d%3 and d%4); doc 1 is clean and reassembles verbatim."""
    from pyspark.sql import functions as F

    from magicxml_spark.queries import QUERIES

    out = {
        r.doc_id: r
        for r in QUERIES["q_quality_paragraphs"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert out[3].n_paras == 3 and out[3].n_kept == 2
    assert out[12].n_paras == 4 and out[12].n_kept == 2
    assert out[1].n_paras == 2 and out[1].n_kept == 2
    # the kept text of a clean doc is the verbatim synthesis
    import hashlib

    clean = (
        "the quick brown fox jumps over the lazy dog in d1\n\n"
        "we can read the good story of the old house at d1"
    )
    assert out[1].text_fp == hashlib.md5(clean.encode()).hexdigest()
