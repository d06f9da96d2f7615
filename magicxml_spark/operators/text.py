"""Text-analysis operators for the LLM-data-pipeline extension.

Language ID (n-gram/stopword heuristic), quality scoring, token
counting, and document fingerprinting over a text column — all built
from JVM-side `pyspark.sql.functions` so they run inside whole-stage
codegen at 100 TB (no Python UDFs in any of these paths).

These are extensions beyond the reference repo (BASELINE.json north
star); the reference's own text handling stops at TF-IDF over category
paths (assets/TF-IDF Visualization/main.py:26-27).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
# Deliberately small and deterministic — the point is the *operator
# shape* (vectorized per-language scoring + argmax), not lexicon
# quality; swap in real lexicons for production.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit"],
    "fr": ["le", "la", "les", "et", "est", "avec"],
    "es": ["el", "la", "los", "que", "es", "con"],
    "zh": ["的", "是", "在", "了", "和", "有"],
}

_WS = "\\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empties dropped (split('') artifacts)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), _WS), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# A BPE-ish proxy: count subword units as runs of letters, digits, or
# single punctuation marks (what a byte-level BPE would not merge
# across). Still pure regexp — no tokenizer library on the hot path.
def subword_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(c, F.lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"), F.lit(0))
    )


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, "[\\.,;:!\\?\"'()\\[\\]{}]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + moderate punct +
    presence of stopwords. Deterministic, codegen-friendly."""
    c = F.col(text) if isinstance(text, str) else text
    len_ok = F.when((F.length(c) >= 50) & (F.length(c) <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(c) >= 0.01, 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + stop_ok) / F.lit(3.0), 4)


def _contains_fn(arr: Column):
    # NB: must be a single-arg lambda — PySpark binds a two-arg lambda
    # in F.filter as (element, index), so default-arg capture is unsafe.
    return lambda t: F.array_contains(arr, t)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (token-exact, not substring)."""
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, _contains_fn(arr)))
    return out


def lang_id(text: Column | str) -> Column:
    """Argmax language by marker hits; ties and zero-hit rows -> 'und'.

    Spelled as a sort over (score, lang) structs so the whole argmax is
    one expression — no join, no shuffle, no UDF.
    """
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores.items()]
    )
    best = F.element_at(F.array_sort(pairs, lambda a, b: b["score"] - a["score"]), 1)
    # deterministic tie-break: if the runner-up has the same score -> 'und'
    second = F.element_at(F.array_sort(pairs, lambda a, b: b["score"] - a["score"]), 2)
    return F.when(
        (best["score"] > 0) & (best["score"] != second["score"]), best["lang"]
    ).otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (stable under reflow), first 16 hex chars."""
    c = F.col(text) if isinstance(text, str) else text
    normed = F.trim(F.regexp_replace(F.lower(c), _WS, " "))
    return F.substring(F.md5(normed), 1, 16)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: counts, ratios, quality, language, fingerprint."""
    c = F.col(text_col)
    return df.select(
        *df.columns,
        token_count(c).alias("n_tokens"),
        subword_count(c).alias("n_subwords"),
        F.length(c).alias("n_chars_measured"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio_en"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
