"""Unit tests for operators/extraction.py — jusText paragraph
classification with hand-worked pins from the paper's rules
(Pomikalek 2011 ch. 4). Engine parity for q_justext_extract lives in
test_oracle_parity."""

from __future__ import annotations

from magicxml_spark.operators.extraction import (
    JUSTEXT_STOPWORDS,
    justext_boilerplate,
)

# ~49 words, 36 stopword hits (density 0.73), 221 chars: context-free
# GOOD (>= stopwords_high and > length_high)
GOOD = (
    "the data is in the table and it is good that we have it with the "
    "rest of the set so that the story it tells is clear to all of us "
    "and we can be sure that the numbers are as they should be for the "
    "people who read them"
)
# long but stopword-free: context-free BAD
SALAD = "alpha beta gamma delta epsilon zeta " * 8
# < 70 chars: context-free SHORT
SHORT = "quick stats"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, text):
    return justext_boilerplate(_docs(spark, [(1, text)])).collect()[0]


def test_justext_context_free_classes(spark):
    assert len(GOOD) > 200
    words = GOOD.split()
    dens = sum(w in JUSTEXT_STOPWORDS for w in words) / len(words)
    assert dens >= 0.32  # the pin's own precondition
    r = _run(spark, GOOD)
    assert (r["n_paras"], r["n_good"], r["text_main"]) == (1, 1, GOOD)
    r = _run(spark, SALAD)
    assert (r["n_good"], r["text_main"]) == (0, "")


def test_justext_short_needs_both_good_neighbors(spark):
    # good | short | good -> short promoted (paper's smoothing)
    r = _run(spark, f"{GOOD}\n\n{SHORT}\n\n{GOOD}")
    assert r["n_good"] == 3 and SHORT in r["text_main"]
    # bad | short | good -> short stays bad (needs BOTH)
    r = _run(spark, f"{SALAD}\n\n{SHORT}\n\n{GOOD}")
    assert r["n_good"] == 1 and SHORT not in r["text_main"]
    # document edge counts as bad: short leading the doc dies
    r = _run(spark, f"{SHORT}\n\n{GOOD}")
    assert r["n_good"] == 1 and SHORT not in r["text_main"]


def test_justext_neargood_needs_one_good_neighbor(spark):
    # mid-density long paragraph: 6 stopwords / 20 words = 0.30 ->
    # neargood (in [stopwords_low, stopwords_high)), > length_low chars
    near = "the and of to in on " + " ".join(f"zebra{j}" for j in range(14))
    words = near.split()
    dens = sum(w in JUSTEXT_STOPWORDS for w in words) / len(words)
    assert 0.30 <= dens < 0.32, dens
    assert len(near) >= 70
    r = _run(spark, f"{near}\n\n{GOOD}")  # one good neighbor -> good
    assert r["n_good"] == 2
    r = _run(spark, f"{SALAD}\n\n{near}\n\n{SALAD}")  # bad on both sides
    assert r["n_good"] == 0


def test_justext_copyright_kills_regardless(spark):
    marked = GOOD + " copyright"
    r = _run(spark, f"{GOOD}\n\n{marked}\n\n{GOOD}")
    assert r["n_good"] == 2 and "copyright" not in r["text_main"]


def test_justext_empty_and_fraction(spark):
    r = _run(spark, "")
    assert (r["n_paras"], r["n_good"], r["main_frac"]) == (1, 0, 0.0)
    r = _run(spark, f"{GOOD}\n\n{SALAD}")
    assert 0.0 < r["main_frac"] < 1.0
    assert r["main_frac"] == round(len(GOOD) / (len(GOOD) + 2 + len(SALAD)), 4)
