"""Published-recipe corpus curation filters (round 7).

The heavy-hitter text-curation recipes from the public literature,
re-expressed Spark-first over a (id, text) frame:

* ``paragraph_dedup`` — Dolma-class corpus-wide paragraph-level exact
  dedup, FIRST occurrence wins (Soldaini et al. 2024 "Dolma" §4.1 run
  dedup at document/paragraph granularity; Lee et al. 2021 establish
  first-occurrence-wins for exact substring dedup).
* ``gopher_repetition`` / ``gopher_line_cols`` / ``gopher_quality`` —
  the COMPLETE Gopher rule set (Rae et al. 2021, "Scaling Language
  Models", Appendix A1.1): word-count / word-length / symbol / alpha
  / stopword gates, the full n-gram repetition battery (top 2-4-gram
  char fraction, duplicated 5-10-gram char fraction), the duplicate
  line/paragraph fractions by count and char mass (0.30/0.30 and
  0.20/0.20 caps), and the bullet-start (90%) / ellipsis-end (30%)
  line-shape rules.
* ``c4_line_filters`` — the C4 line-level cleaning rules (Raffel et
  al. 2020 §2.2): terminal punctuation, minimum words per line,
  blocklisted fragments, minimum surviving lines per document.
* ``exact_ntile`` — distributed exact NTILE over an explicit total
  order (two-phase rank: range partition + local window + tiny offset
  collect — the pack_shards pattern; a plain global window would be
  one sorted task at 100 TB).
* ``perplexity_buckets`` — CCNet-class head/middle/tail bucketing
  (Wenzek et al. 2020 §4.3) over the unigram-surprisal score, using
  ``exact_ntile`` so bucket boundaries are rank-exact (no float
  quantile interpolation to drift between engines).

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs): these paths run inside whole-stage codegen and shuffle only on
hashed keys or pre-aggregated metric rows. The reference repo
(main.py) has no corpus-curation surface; these extend the
LLM-data-pipeline class alongside operators/dedup.py and text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from magicxml_spark.operators.text import tokens

# ---------------------------------------------------------------------------
# Dolma-class paragraph dedup (first occurrence wins)
# ---------------------------------------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup: split each document on
    ``sep``, keep only the FIRST occurrence (by ``(id, position)``
    order) of every distinct paragraph, and reassemble documents from
    their surviving paragraphs.

    This is the Dolma paragraph-granularity dedup pass — distinct from
    ``dedup.dedup_lines`` (which REMOVES every occurrence of lines
    whose document frequency exceeds a cap, the C4 boilerplate rule):
    here exactly one copy of each paragraph survives corpus-wide, so
    no content is lost, only repetition.

    Output: one row per input document —
    ``(id, n_paras, n_kept, text_dedup)`` where ``text_dedup`` is the
    surviving paragraphs re-joined with ``sep`` (empty string when
    every paragraph was a later duplicate).

    Scale shape: posexplode -> ONE window shuffle keyed on the
    paragraph hash (min order-key per paragraph = first occurrence; the
    window partitions on ``md5(para)``) -> ONE groupBy on the doc id
    that computes totals, kept counts, and the reassembled text in the
    same aggregation (keep/drop rides as a marker column, so there is
    no totals-vs-rebuilt join and the exploded corpus is materialized
    exactly once). No self-join, nothing quadratic; skew = the most
    repeated paragraph's occurrence count, which the window's
    partial-sort handles (same shape as substring_dedup's gram
    window)."""
    import re

    from pyspark.sql import Window

    # split on the LITERAL separator (F.split takes a regex; "|" or
    # "." as sep would otherwise split on everything/anything)
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias(
            "_pos", "_para"
        ),
    )
    # first-occurrence key: global (id, pos) order, hash-keyed window.
    # min(struct) is the proven order-isomorphic spelling from
    # substring_dedup (any id type, one aggregate-free window pass).
    w = Window.partitionBy(F.md5("_para"))
    marked = paras.withColumn("_okey", F.struct("_id", "_pos")).withColumn(
        "_keep", F.min("_okey").over(w) == F.col("_okey")
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            # dropped paragraphs' TEXT never crosses the rebuild
            # exchange: collect_list skips nulls, so the kept-filter
            # moves INSIDE the partial aggregate (guide §2.3 "shuffle
            # fewer bytes"; value-identical — pos is unique per doc, so
            # sorting (pos, para) structs of the kept subset reproduces
            # the old filter-after-sort order, and a NULL/false keep
            # dropped the row in both spellings)
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("_pos", "_para"),
                            )
                        )
                    ),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("text_dedup"),
        )
        .select(F.col("_id").alias(id_col), "n_paras", "n_kept", "text_dedup")
    )


# ---------------------------------------------------------------------------
# Gopher repetition + quality rules (Rae et al. 2021 Appendix A1.1)
# ---------------------------------------------------------------------------

#: (metric, n, threshold): document is LOW QUALITY when metric > threshold.
#: Values are the published Gopher table.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

#: Duplicate line / paragraph rows of the same published table (Rae et
#: al. 2021 Table A1): fraction of lines (paragraphs) that are repeats
#: of an earlier one, by element count and by character mass.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20

#: A1.1 line-shape quality rules: remove when MORE than 90% of lines
#: start with a bullet, or more than 30% end with an ellipsis.
GOPHER_MAX_BULLET_LINE_FRAC = 0.90
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.30
GOPHER_BULLET_CHARS = ["•", "‣", "▶", "-", "*"]


def _dup_fracs(arr: Column) -> tuple[Column, Column]:
    """(dup_frac, dup_char_frac) for an array of elements — the Gopher
    duplicate-line/paragraph algebra: every occurrence AFTER the first
    of a distinct element is a duplicate; the char-mass variant weights
    each duplicate by its length over the elements' total length
    (equivalently: total chars minus first-occurrence chars — computed
    here via array_distinct, no explode, no shuffle). Empty arrays and
    zero-char totals report 0."""
    n = F.size(arr)
    nd = F.size(F.array_distinct(arr))

    def _chars(a: Column) -> Column:
        return F.aggregate(a, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))

    total = _chars(arr)
    firsts = _chars(F.array_distinct(arr))
    dup_frac = F.when(n > 0, F.round((n - nd) / n, 6)).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        total > 0, F.round((total - firsts) / total, 6)
    ).otherwise(F.lit(0.0))
    return dup_frac, dup_char_frac


def gopher_line_cols(text: Column) -> list[Column]:
    """The per-document LINE/PARAGRAPH rules of Gopher A1.1 as pure
    Column expressions (zero shuffle — these ride the same codegen
    projection as the scalar gates):

    * ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines
      (paragraphs, split on a blank line) that repeat an earlier one
      (published caps 0.30 / 0.30);
    * ``dup_line_char_frac`` / ``dup_para_char_frac`` — character mass
      of those repeats over the elements' total characters (caps
      0.20 / 0.20; the paper phrases the denominator as the document
      text — the element char mass spelling drops only the separator
      bytes and is engine-exact, documented deviation);
    * ``bullet_line_frac`` — lines whose first non-space char is a
      bullet mark (cap 0.90);
    * ``ellipsis_line_frac`` — lines ending (space-trimmed) in ``...``
      or ``…`` (cap 0.30).

    EMPTY lines/paragraphs are excluded from every metric: the blank
    line between two paragraphs is document STRUCTURE, not repeated
    content — counting ``''`` as a duplicate line would push ordinary
    multi-paragraph text over the 0.30 cap (P 2-line paragraphs →
    (P-2)/(3P-1) → 1/3 blank "duplicates" as P grows), inverting the
    rule's intent. Deliberate, documented refinement of the paper's
    unspecified line-splitting."""

    def _nonempty(arr: Column) -> Column:
        return F.filter(arr, lambda x: x != F.lit(""))

    lines = _nonempty(F.split(text, "\n", -1))
    paras = _nonempty(F.split(text, "\n\n", -1))
    dl, dlc = _dup_fracs(lines)
    dp, dpc = _dup_fracs(paras)
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin(GOPHER_BULLET_CHARS),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    frac = lambda c: F.when(  # noqa: E731
        n_lines > 0, F.round(c / n_lines, 6)
    ).otherwise(F.lit(0.0))
    return [
        dl.alias("dup_line_frac"),
        dlc.alias("dup_line_char_frac"),
        dp.alias("dup_para_frac"),
        dpc.alias("dup_para_char_frac"),
        frac(bullet).alias("bullet_line_frac"),
        frac(ellipsis).alias("ellipsis_line_frac"),
    ]


def _order_grams(words: Column, n: int) -> Column:
    """All order-``n`` grams of ``words`` as space-joined strings
    (empty array when the document is shorter than the order — the
    sequence end is clamped to 1 because BOTH when-branches evaluate
    and ``sequence(1, k)`` DESCENDS for k < 1)."""

    def gram_at(i: Column) -> Column:
        return F.array_join(F.slice(words, i, n), " ")

    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        gram_at,
    )
    return F.when(F.size(words) >= n, arr).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def _char_mass(arr: Column) -> Column:
    """Total char mass of an array of strings (zero for empty)."""
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _top_gram_mass(words: Column, n: int) -> Column:
    """Char mass (count x length) of the MOST FREQUENT order-``n``
    gram, ties broken by mass (longer gram) — one in-row fold over the
    SORTED gram array: equal grams are adjacent after the sort, so a
    (prev, run, best-count, best-mass) accumulator finds the max run
    without any per-gram aggregation. The sort+fold run INSIDE one
    ``aggregate`` expression whose array argument evaluates exactly
    once per row (higher-order functions materialize their input
    array), so no Catalyst rewrite can duplicate the gram build."""
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("p"),
        zero.alias("r"),
        zero.alias("bc"),
        zero.alias("bm"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = (
            F.when(x == acc["p"], acc["r"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        m = run * F.length(x).cast("long")
        # lexicographic (count, mass) max — count first, mass breaks
        # ties (the published definition's max(struct(c, m)) order).
        # Prefix candidates of a run are dominated by its full length,
        # so folding every prefix finds the same max as whole runs.
        better = (run > acc["bc"]) | ((run == acc["bc"]) & (m > acc["bm"]))
        return F.struct(
            x.alias("p"),
            run.alias("r"),
            F.when(better, run).otherwise(acc["bc"]).alias("bc"),
            F.when(better, m).otherwise(acc["bm"]).alias("bm"),
        )

    return F.aggregate(
        F.array_sort(_order_grams(words, n)), acc0, merge,
        lambda acc: acc["bm"],
    )


def gopher_repetition_cols(
    words_ref: Column, chars_ref: Column, grams_ref: dict[int, Column]
) -> list[Column]:
    """The nine Gopher repetition fractions as pure per-row Column
    expressions — the shared core of :func:`gopher_repetition` and
    :func:`gopher_quality`. ``words_ref``/``chars_ref`` must be
    MATERIALIZED column references (not inline expressions);
    ``grams_ref`` maps each dup order to its materialized gram-array
    column (the dup algebra references its array twice — total minus
    first-occurrence mass, the :func:`_dup_fracs` spelling — so the
    array must be a column, not a rebuilt expression)."""

    def frac(mass: Column) -> Column:
        return F.coalesce(
            F.when(
                chars_ref > 0, F.round(mass / chars_ref, 6)
            ).otherwise(F.lit(0.0)),
            F.lit(0.0),
        )

    cols = [
        frac(_top_gram_mass(words_ref, n)).alias(f"top_ngram_frac_{n}")
        for n in sorted(GOPHER_TOP_NGRAM_MAX)
    ]
    for n in sorted(GOPHER_DUP_NGRAM_MAX):
        g = grams_ref[n]
        # duplicated char mass = total mass - first-occurrence mass
        # (every non-first occurrence of a gram contributes its
        # length) — hash-based array_distinct, no sort needed
        cols.append(
            frac(_char_mass(g) - _char_mass(F.array_distinct(g))).alias(
                f"dup_ngram_frac_{n}"
            )
        )
    return cols


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher n-gram repetition battery, exactly as published:

    * ``top_ngram_frac_{2,3,4}`` — fraction of the document's
      CHARACTERS accounted for by its single most frequent n-gram
      (count x gram length / total chars).
    * ``dup_ngram_frac_{5..10}`` — fraction of characters contained in
      duplicated n-grams, where every non-first occurrence of a gram
      contributes its length (the standard de-overlap-free
      implementation used by the public curation stacks; documented
      approximation of the paper's character-coverage phrasing).

    Character totals use the whitespace-normalized token join (tokens
    joined by single spaces) so the fractions are tokenizer-consistent
    rather than raw-byte-sensitive.

    Scale shape (r12 rewrite, guide §2.3/§2.4): every metric is
    per-DOCUMENT, so the whole battery now runs as in-row array
    arithmetic inside one projection — top fractions fold a sorted
    gram array (equal grams adjacent -> max run = max count), dup
    fractions take total-minus-distinct char mass — and the 9x gram
    amplification NEVER crosses an exchange. The r11 shape exploded
    (id, n, gram) for all nine orders into a 3-level aggregation:
    same values, but every gram string was shuffled (and the
    deliberately collision-free bench corpora gave the map-side
    combine ~zero compression). Zero shuffles besides the compact
    (id, tokens) pre-compute repartition (kept: the per-row work
    otherwise runs at the scan's split count — a couple of local
    parquet files starve a 32-core box; measured 16x there). Docs
    shorter than an order report 0 for that metric; sf0.1 standalone
    A/B: 3.36 -> 2.45 s noop-sink min-of-3, and the plan drops from
    14 Exchanges + double scan to 1 Exchange + single scan."""
    words = tokens(F.coalesce(F.col(text_col), F.lit("")))
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .repartition(par)
        .select(
            "_id",
            F.length(F.array_join("_w", " ")).alias("_chars"),
            F.col("_w"),
            *[
                _order_grams(F.col("_w"), n).alias(f"_g{n}")
                for n in sorted(GOPHER_DUP_NGRAM_MAX)
            ],
        )
    )
    grams_ref = {
        n: F.col(f"_g{n}") for n in sorted(GOPHER_DUP_NGRAM_MAX)
    }
    return base.select(
        F.col("_id").alias(id_col),
        F.col("_chars").alias("n_chars_norm"),
        *gopher_repetition_cols(F.col("_w"), F.col("_chars"), grams_ref),
    )


#: Published scalar-gate thresholds (Rae et al. 2021 A1.1).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> DataFrame:
    """Per-document Gopher quality gate — the COMPLETE published
    A1.1 rule set (Rae et al. 2021): the scalar gates and the
    line/paragraph rules (:func:`gopher_line_cols` — duplicate
    line/paragraph fractions by count and char mass, bullet-start and
    ellipsis-end line fractions) computed in one codegen projection,
    joined with :func:`gopher_repetition`'s n-gram battery, and the
    published thresholds folded into a single ``keep`` flag.
    Word-count bounds are parameters (the paper's 50 / 100k defaults)
    because every downstream corpus retunes them.

    Output: (id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, n_stopwords, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, bullet_line_frac,
    ellipsis_line_frac, top/dup n-gram fracs, rep_flag, keep) —
    ``rep_flag`` true when ANY repetition metric (n-gram OR duplicate
    line/paragraph) exceeds its published cap, ``keep`` the full
    conjunction including the bullet/ellipsis line-shape rules. Metric
    columns are rounded to 6dp so the frame is engine-exact.

    Scale (r12 rewrite): the ENTIRE battery — scalar gates,
    line/paragraph rules AND the n-gram repetition metrics — is one
    per-row projection chain over a single scan: the repetition arm's
    explode + 3-level aggregation + id-keyed join are gone (see
    :func:`gopher_repetition_cols`), leaving exactly one exchange
    (the compact (id, text) pre-compute repartition that spreads
    per-row work past the scan's split count). q_gopher_quality's
    plan: 14 Exchanges + 2 scans -> 1 Exchange + 1 scan."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    par = df.sparkSession.sparkContext.defaultParallelism
    s1 = (
        df.select(F.col(id_col).alias("_id"), t.alias("_text"))
        .repartition(par)
        .select("_id", "_text", tokens(F.col("_text")).alias("_w"))
    )
    s2 = s1.select(
        "_id",
        "_text",
        "_w",
        F.length(F.array_join("_w", " ")).alias("_chars"),
        *[
            _order_grams(F.col("_w"), n).alias(f"_g{n}")
            for n in sorted(GOPHER_DUP_NGRAM_MAX)
        ],
    )
    grams_ref = {n: F.col(f"_g{n}") for n in sorted(GOPHER_DUP_NGRAM_MAX)}
    joined = s2.select(
        "_id",
        F.size("_w").cast("long").alias("n_words"),
        # ANSI mode makes x/0 a JOB FAILURE, not a NULL, and a
        # zero-token document is an expected corpus state (an
        # extraction stage can empty a page; Catalyst may also reorder
        # this frame's deterministic `keep` predicate BEFORE an
        # upstream language gate — observed in the v5 composition).
        # Every by-word-count division is therefore when-guarded, the
        # mixture_weights rule; coalesce alone cannot catch a RAISED
        # division error.
        F.round(
            F.when(
                F.size("_w") > 0,
                F.aggregate("_w", F.lit(0), lambda a, w: a + F.length(w))
                / F.size("_w"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mean_word_len"),
        # symbol-to-word ratio: '#' and ellipsis occurrences per word
        F.round(
            F.when(
                F.size("_w") > 0,
                (
                    F.size(F.split("_text", "#", -1))
                    - 1
                    + F.size(F.split("_text", "\\.\\.\\.", -1))
                    - 1
                )
                / F.size("_w"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("symbol_ratio"),
        F.round(
            F.when(
                F.size("_w") > 0,
                F.size(F.filter("_w", lambda w: w.rlike("[a-z]")))
                / F.size("_w"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("alpha_word_frac"),
        F.size(F.filter("_w", lambda w: w.isin(GOPHER_STOPWORDS)))
        .cast("long")
        .alias("n_stopwords"),
        *gopher_line_cols(F.col("_text")),
        *gopher_repetition_cols(F.col("_w"), F.col("_chars"), grams_ref),
    )
    # repetition caps: the n-gram battery PLUS the duplicate
    # line/paragraph rows of the same published table
    rep_exceeds = [
        F.col(f"top_ngram_frac_{n}") > F.lit(t) for n, t in GOPHER_TOP_NGRAM_MAX.items()
    ] + [
        F.col(f"dup_ngram_frac_{n}") > F.lit(t) for n, t in GOPHER_DUP_NGRAM_MAX.items()
    ]
    rep_flag = None
    for c in rep_exceeds:
        rep_flag = c if rep_flag is None else (rep_flag | c)
    dup_flag = (
        (F.col("dup_line_frac") > GOPHER_MAX_DUP_LINE_FRAC)
        | (F.col("dup_para_frac") > GOPHER_MAX_DUP_PARA_FRAC)
        | (F.col("dup_line_char_frac") > GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        | (F.col("dup_para_char_frac") > GOPHER_MAX_DUP_PARA_CHAR_FRAC)
    )
    full_rep_flag = F.coalesce(rep_flag, F.lit(False)) | dup_flag
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & ~full_rep_flag
    )
    rep_cols = [f"top_ngram_frac_{n}" for n in sorted(GOPHER_TOP_NGRAM_MAX)] + [
        f"dup_ngram_frac_{n}" for n in sorted(GOPHER_DUP_NGRAM_MAX)
    ]
    line_cols = [
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_para_frac",
        "dup_para_char_frac",
        "bullet_line_frac",
        "ellipsis_line_frac",
    ]
    return joined.select(
        F.col("_id").alias(id_col),
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "n_stopwords",
        *line_cols,
        *[F.coalesce(c, F.lit(0.0)).alias(c) for c in rep_cols],
        full_rep_flag.alias("rep_flag"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

#: line-level tell ("javascript") vs document-level kills ("lorem
#: ipsum", "{") — Raffel et al. 2020 §2.2 drop the whole PAGE for the
#: latter two.
C4_LINE_FRAGMENTS = ["javascript"]
C4_DOC_FRAGMENTS = ["lorem ipsum", "{"]
C4_MIN_LINE_WORDS = 3
C4_MIN_DOC_LINES = 5
C4_TERMINALS = (".", "!", "?", '"')


#: segmentation marker bytes for the sentence splitter / span hash —
#: control characters that cannot appear in the tokenized text
_C4_SENT_MARK = "\x1e"  # record separator: sentence boundary
_C4_SPAN_SEP = "\x1f"  # unit separator: joins sentences in a span hash


def c4_sentences(text: Column) -> Column:
    """Sentence segmentation shared by the C4 span-dedup rule: a
    sentence ends at ``. ! ?`` followed by whitespace (or at
    end-of-text); results are trimmed and empties dropped. Spelled as
    mark-then-split (capture-group replace inserts a control byte at
    each boundary) because RE2 — the DuckDB oracle's engine — has no
    lookbehind; both engines segment identically (pinned)."""
    marked = F.regexp_replace(text, r"([.!?])\s+", "$1" + _C4_SENT_MARK)
    return F.filter(
        # single-arg lambda, NOT bare F.trim: transform() passes the
        # element INDEX to any two-arg callable, and F.trim's optional
        # trimStr param would silently become "strip digit chars"
        F.transform(F.split(marked, _C4_SENT_MARK), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def _c4_sents_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, _s sentence-array) frame with the pre-explode repartition
    (the gopher_repetition/_lm_positions fix): span hashing otherwise
    runs at the scan's split count; the shuffled payload is the
    compact (id, sentence-array) frame."""
    return df.select(
        F.col(id_col).alias("_id"),
        c4_sentences(F.col(text_col)).alias("_s"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)


def _c4_spans_frame(sents: DataFrame) -> DataFrame:
    """(_id, start, h) — every consecutive 3-sentence window's md5;
    only 32-byte keys ever shuffle, never span text."""
    sep = _C4_SPAN_SEP
    return sents.filter(F.size("_s") >= 3).select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_s") - 3),
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(
                        F.concat_ws(
                            sep,
                            F.element_at("_s", i + 1),
                            F.element_at("_s", i + 2),
                            F.element_at("_s", i + 3),
                        )
                    ).alias("h"),
                ),
            )
        ).alias("_sp"),
    ).select("_id", "_sp.start", "_sp.h")


def c4_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4's OTHER dedup rule — Raffel et al. 2020 §2.2: "we discarded
    all but one of any three-sentence span occurring more than once in
    the data set." Documents split into sentences
    (:func:`c4_sentences`); every consecutive 3-sentence window is a
    span; for spans occurring more than once corpus-wide, the FIRST
    occurrence (minimum (doc_id, start) — the engine's deterministic
    first-seen convention, document order not being reproducible on a
    distributed scan) survives and every other occurrence has its
    three sentences removed. Overlap semantics (documented, matching
    the straightforward published reimplementation): removals are by
    sentence position with no protection pass, so a retained span that
    shares sentences with a removed occurrence in the same document
    loses the shared sentences. Documents with fewer than 3 sentences
    have no spans and pass through whole.

    Output: (id, n_sentences, n_kept, text_dedup) — one row per input
    document, survivors joined by single spaces.

    Scale shape: one projection builds the sentence array, one explode
    emits (id, start, md5(span)) — md5 so only 32-byte keys shuffle,
    never span text; one groupBy(hash) finds the keeper, one equi-join
    marks kills, one id-keyed collect rides the (bounded,
    spans-per-doc) kill list back, and the rebuild is a JVM-side
    indexed filter over the sentence array. No window over the corpus,
    no self-join on text."""
    sents = _c4_sents_frame(df, id_col, text_col)
    spans = _c4_spans_frame(sents)
    keepers = spans.groupBy("h").agg(
        F.min(F.struct(F.col("_id").alias("kid"), F.col("start").alias("kstart"))).alias(
            "keep"
        ),
        F.count(F.lit(1)).alias("c"),
    )
    kills = (
        spans.join(keepers.filter(F.col("c") > 1), "h")
        .filter(
            (F.col("_id") != F.col("keep.kid"))
            | (F.col("start") != F.col("keep.kstart"))
        )
        .groupBy("_id")
        .agg(F.collect_list("start").alias("_kills"))
    )
    rebuilt = sents.join(kills, "_id", "left")
    kept = F.filter(
        F.col("_s"),
        lambda s, i: ~F.exists(
            F.col("_kills"), lambda k: (i >= k) & (i <= k + 2)
        ),
    )
    return rebuilt.select(
        F.col("_id").alias(id_col),
        F.size("_s").cast("bigint").alias("n_sentences"),
        F.when(F.col("_kills").isNull(), F.size("_s"))
        .otherwise(F.size(kept))
        .cast("bigint")
        .alias("n_kept"),
        F.when(F.col("_kills").isNull(), F.concat_ws(" ", F.col("_s")))
        .otherwise(F.concat_ws(" ", kept))
        .alias("text_dedup"),
    )


# ---------------------------------------------------------------------------
# Frozen paragraph / span dedup snapshots — the cross-crawl lifecycle
# (VERDICT r10 "What's missing #2"). Re-crawl dedup against last
# month's corpus is THE production shape at 100 TB: the snapshot holds
# hash keys only (32 bytes per distinct paragraph/span, never text),
# re-ingest is O(delta), and because the keeper set is a plain set
# union, append == rebuild EXACTLY for the delta's rows (the DSIR
# frozen-lifecycle precedent; proven in tests). Prior-crawl documents
# are never retroactively modified — the published-corpus contract.
#
# Equivalence contract (documented, pinned): incremental output for a
# delta equals the full rebuild restricted to the delta's documents
# when prior-crawl order keys sort before the delta's (crawl N's ids <
# crawl N+1's — the natural monotone-id / crawl-date ordering).
# ---------------------------------------------------------------------------


def _paragraph_hashes(
    corpus: DataFrame, text_col: str, sep: str
) -> DataFrame:
    """Distinct md5(paragraph) set of a corpus — the entire snapshot
    payload (column ``ph``)."""
    import re

    return (
        corpus.select(
            F.explode(
                F.split(F.col(text_col), re.escape(sep), -1)
            ).alias("_para")
        )
        .select(F.md5("_para").alias("ph"))
        .distinct()
    )


def write_paragraph_snapshot(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    sep: str = "\n\n",
) -> None:
    """Persist the corpus's distinct paragraph-hash set to
    ``{path}/paragraphs``. ALL hashes ship (kept and killed alike):
    the full-rebuild keeper set is exactly "every distinct hash seen",
    which is what makes append == rebuild hold as a set union."""
    import os

    _paragraph_hashes(corpus, text_col, sep).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "paragraphs"))


def append_paragraph_snapshot(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    sep: str = "\n\n",
) -> None:
    """Fold a newly ingested batch's paragraph hashes into the
    snapshot (parquet append — O(delta) writes, never a snapshot
    rewrite on the ingest path; duplication across files is tolerated
    by the reader's distinct and reclaimed by
    ``compact_paragraph_snapshot``)."""
    import os

    _paragraph_hashes(batch, text_col, sep).write.mode("append").parquet(
        os.path.join(path, "paragraphs")
    )


def compact_paragraph_snapshot(spark: SparkSession, path: str) -> None:
    """Crash-safe distinct rewrite of an appended-to paragraph
    snapshot (the shared staged-swap lifecycle)."""
    from magicxml_spark.operators.dedup import compact_snapshot_tables

    compact_snapshot_tables(spark, path, ("paragraphs",))


def paragraph_dedup_against_snapshot(
    new_batch: DataFrame,
    snapshot_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """:func:`paragraph_dedup` for a re-crawl delta against a frozen
    prior-crawl snapshot: a paragraph whose hash appears in the
    snapshot is dropped from EVERY delta document (the prior crawl
    holds its keeper); within the delta, first occurrence wins exactly
    as in the batch operator. Output schema matches
    :func:`paragraph_dedup` — (id, n_paras, n_kept, text_dedup).

    Scale shape: the batch explodes once, ONE hash-keyed window for
    batch-internal firsts, one equi-join against the snapshot's
    distinct hash set (broadcast when small, plain shuffled hash join
    when not), one id-keyed reassembly aggregate. The snapshot side is
    hash keys only — prior-crawl text is never read."""
    import os
    import re

    from pyspark.sql import Window

    spark = new_batch.sparkSession
    prior = (
        spark.read.parquet(os.path.join(snapshot_path, "paragraphs"))
        .select("ph")
        .distinct()
        .withColumn("_in_prior", F.lit(1))
    )
    paras = new_batch.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias(
            "_pos", "_para"
        ),
    ).withColumn("ph", F.md5("_para"))
    w = Window.partitionBy("ph")
    marked = (
        paras.withColumn("_okey", F.struct("_id", "_pos"))
        .withColumn("_first", F.min("_okey").over(w) == F.col("_okey"))
        .join(prior, "ph", "left")
        .withColumn("_keep", F.col("_first") & F.col("_in_prior").isNull())
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            # kept-filter inside the partial aggregate (collect_list
            # skips nulls): known-duplicate paragraphs' text never
            # crosses the rebuild exchange (paragraph_dedup's r13
            # spelling; value-identical — see that site)
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("_pos", "_para"),
                            )
                        )
                    ),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("text_dedup"),
        )
        .select(F.col("_id").alias(id_col), "n_paras", "n_kept", "text_dedup")
    )


def write_span_snapshot(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the corpus's distinct 3-sentence-span hash set
    (:func:`c4_span_dedup`'s keys) to ``{path}/spans``."""
    import os

    spans = _c4_spans_frame(_c4_sents_frame(corpus, id_col, text_col))
    spans.select(F.col("h").alias("sh")).distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "spans"))


def append_span_snapshot(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a newly ingested batch's span hashes into the snapshot
    (parquet append, O(delta) — see ``append_paragraph_snapshot``)."""
    import os

    spans = _c4_spans_frame(_c4_sents_frame(batch, id_col, text_col))
    spans.select(F.col("h").alias("sh")).distinct().write.mode(
        "append"
    ).parquet(os.path.join(path, "spans"))


def compact_span_snapshot(spark: SparkSession, path: str) -> None:
    """Crash-safe distinct rewrite of an appended-to span snapshot."""
    from magicxml_spark.operators.dedup import compact_snapshot_tables

    compact_snapshot_tables(spark, path, ("spans",))


def span_dedup_against_snapshot(
    new_batch: DataFrame,
    snapshot_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`c4_span_dedup` for a re-crawl delta against a frozen
    prior-crawl snapshot: every delta occurrence of a snapshot span is
    removed (the prior crawl holds its keeper — even a span the prior
    crawl saw only once kills the delta copy, exactly as the full
    rebuild's count includes the prior occurrence); spans new to this
    delta dedup batch-internally with the standard first-occurrence
    rule. Output schema matches :func:`c4_span_dedup` —
    (id, n_sentences, n_kept, text_dedup).

    Same overlap semantics as the batch operator: kills are by
    sentence position with no protection pass."""
    import os

    spark = new_batch.sparkSession
    prior = (
        spark.read.parquet(os.path.join(snapshot_path, "spans"))
        .select(F.col("sh").alias("h"))
        .distinct()
        .withColumn("_in_prior", F.lit(1))
    )
    sents = _c4_sents_frame(new_batch, id_col, text_col)
    spans = _c4_spans_frame(sents).join(prior, "h", "left")
    fresh = spans.filter(F.col("_in_prior").isNull())
    keepers = fresh.groupBy("h").agg(
        F.min(
            F.struct(F.col("_id").alias("kid"), F.col("start").alias("kstart"))
        ).alias("keep"),
        F.count(F.lit(1)).alias("c"),
    )
    kills_batch = (
        fresh.join(keepers.filter(F.col("c") > 1), "h")
        .filter(
            (F.col("_id") != F.col("keep.kid"))
            | (F.col("start") != F.col("keep.kstart"))
        )
        .select("_id", "start")
    )
    kills_prior = spans.filter(F.col("_in_prior").isNotNull()).select(
        "_id", "start"
    )
    kills = (
        kills_prior.union(kills_batch)
        .groupBy("_id")
        .agg(F.collect_list("start").alias("_kills"))
    )
    rebuilt = sents.join(kills, "_id", "left")
    kept = F.filter(
        F.col("_s"),
        lambda s, i: ~F.exists(
            F.col("_kills"), lambda k: (i >= k) & (i <= k + 2)
        ),
    )
    return rebuilt.select(
        F.col("_id").alias(id_col),
        F.size("_s").cast("bigint").alias("n_sentences"),
        F.when(F.col("_kills").isNull(), F.size("_s"))
        .otherwise(F.size(kept))
        .cast("bigint")
        .alias("n_kept"),
        F.when(F.col("_kills").isNull(), F.concat_ws(" ", F.col("_s")))
        .otherwise(F.concat_ws(" ", kept))
        .alias("text_dedup"),
    )


def c4_line_filters(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    pos_col: str = "pos",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_doc_lines: int = C4_MIN_DOC_LINES,
    brace_scope: str = "document",
) -> DataFrame:
    """The C4 cleaning pass over an exploded (id, pos, line) frame:

    * keep only lines ending in terminal punctuation (. ! ? ");
    * drop lines with fewer than ``min_line_words`` words;
    * drop lines containing a blocklisted fragment ("javascript");
    * documents containing "lorem ipsum" OR a curly bracket ``{``
      ANYWHERE are dropped whole — Raffel et al. 2020 §2.2 removes
      the PAGE for both (the brace is the paper's code tell and its
      scope is the document, same as the lorem-ipsum placeholder
      tell; ``brace_scope="line"`` opts into the softer line-level
      drop for callers who only want code LINES removed);
    * finally drop documents with fewer than ``min_doc_lines``
      surviving lines.

    Output: one row per SURVIVING document —
    ``(id, n_lines, n_kept, text_clean)`` with the surviving lines
    re-joined by newline in position order.

    Scale shape: per-line predicates are a pure projection; the
    lorem-ipsum / brace doc kills and the reassembly are one id-keyed
    aggregate each (partial combine; no join carries line text). Takes
    the lines frame as input so callers own the line-splitting (real
    newline corpora split on \\n; the test corpus synthesizes lines
    the same way q_line_dedup does)."""
    if brace_scope not in ("document", "line"):
        raise ValueError(f"brace_scope must be 'document' or 'line': {brace_scope!r}")
    lc = F.lower(F.col(line_col))
    line_ok = (
        F.col(line_col).rlike("[.!?\"]$")
        & (F.size(tokens(F.col(line_col))) >= min_line_words)
        & ~lc.contains("javascript")
    )
    if brace_scope == "line":
        line_ok = line_ok & ~lc.contains("{")
    marked = lines.select(
        F.col(id_col).alias("_id"),
        F.col(pos_col).alias("_pos"),
        F.col(line_col).alias("_line"),
        line_ok.alias("_ok"),
        (
            lc.contains("lorem ipsum")
            | (F.lit(brace_scope == "document") & lc.contains("{"))
        ).alias("_doc_kill"),
    )
    agg = marked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_ok").cast("int")).alias("n_kept"),
        F.max("_doc_kill").alias("_doc_killed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_ok"), F.struct("_pos", "_line"))
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text_clean"),
    )
    return (
        agg.filter(~F.col("_doc_killed") & (F.col("n_kept") >= min_doc_lines))
        .select(F.col("_id").alias(id_col), "n_lines", "n_kept", "text_clean")
    )


# ---------------------------------------------------------------------------
# Distributed exact NTILE + CCNet perplexity buckets
# ---------------------------------------------------------------------------


def two_phase_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    n_range_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global rank over a total order WITHOUT a
    single-task global window: range-partition on the order columns,
    rank locally per partition, then add per-partition row-count
    offsets (one tiny driver collect — rows = partitions, not data;
    the pack_shards two-phase pattern). Returns ``(df + rank_col,
    total_rows)``. The order must be TOTAL (include a unique
    tiebreaker column) or ranks at boundaries are nondeterministic.

    Shared engine under :func:`exact_ntile` and
    ``sampling.seeded_shuffle``."""
    from pyspark.sql import Window

    n = n_range_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint: the offsets collect below is a separate ACTION,
    # and without materialization it re-executes the caller's whole
    # upstream plan once for the collect and again for the real run —
    # in a composed pipeline (q_curation_v3: gate -> score -> rank ->
    # shuffle -> pack, three rank-style collects) that multiplied the
    # expensive gate subtree ~3x. localCheckpoint (not persist!)
    # because persist registers in the CacheManager, which matches by
    # logical plan and silently turns a REPEATED identical query into
    # a cache hit — dishonest benchmarks and surprising reuse;
    # checkpoints are private to this DataFrame. The rank input is
    # narrow by contract (order cols + payload ids), so the
    # materialized frame is small; lineage truncation (executor-loss
    # recompute is lost) is the documented trade.
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_lrank", F.row_number().over(w))
    counts = (
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["_c"]
    # offsets apply via a broadcast join (the pack_shards pattern), NOT
    # a literal when-chain: at cluster scale n_range_partitions is
    # thousands and a per-partition CASE expression bloats codegen
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    out = (
        local.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            rank_col,
            (F.coalesce(F.col("_off"), F.lit(0)) + F.col("_lrank")).cast("long"),
        )
        .drop("_pid", "_lrank", "_off")
    )
    return out, acc


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    bucket_col: str = "bucket",
    n_range_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) over a total order, built on
    :func:`two_phase_rank`. Bucket = floor((rank-1) * n / total) + 1,
    which reproduces SQL NTILE exactly when total % n == 0 and differs
    from it by at most the placement of the remainder rows otherwise
    (SQL NTILE front-loads remainders; this closed form spreads them —
    both are rank-exact, this one needs no second pass). The order
    must be TOTAL (include a unique tiebreaker column) or bucket
    assignment at boundaries is nondeterministic."""
    ranked, total = two_phase_rank(df, order_cols, "_rank", n_range_partitions)
    return ranked.withColumn(
        bucket_col,
        (((F.col("_rank") - 1) * n_buckets) / F.lit(total)).cast("long") + 1,
    ).drop("_rank")


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-class corpus partitioning: score every document with the
    unigram-surprisal perplexity proxy (text.unigram_surprisal — exact
    micro-nat arithmetic, engine-reproducible), then split the corpus
    into ``n_buckets`` rank-exact tiers (CCNet's head/middle/tail for
    n=3; low surprisal = common/fluent = head). Ties on the score
    break by id so the order is total.

    Output: one row per document — (id, n_tokens, surprisal, bucket)
    with bucket 1 = head (lowest surprisal).

    Scale: surprisal is two agg shuffles + a hint-free vocab join
    (AQE broadcasts while the vocab measures small, shuffle-joins
    past that — corpus-derived tables are never force-broadcast);
    bucketing is the two-phase exact_ntile (range shuffle + tiny
    offset collect). Nothing global-sorts on one task."""
    from magicxml_spark.operators.text import unigram_surprisal

    scored = unigram_surprisal(df, id_col, text_col)
    return exact_ntile(scored, ["surprisal", id_col], n_buckets).select(
        id_col, "n_tokens", "surprisal", F.col("bucket").cast("long").alias("bucket")
    )


# ---------------------------------------------------------------------------
# Bigram LM surprisal (Jelinek-Mercer interpolation) — the CCNet-class
# scorer one order up from text.unigram_surprisal
# ---------------------------------------------------------------------------

def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document interpolated bigram language-model surprisal —
    the order-2 rung of :func:`ngram_surprisal` (kept as a named
    operator: its oracle and pins gate the shared ladder, and the
    delegation is bit-exact — ``lam * 0.0 + (1-lam) * p1`` is
    identically ``(1-lam) * p1`` in IEEE doubles, so the generalized
    coalesce spelling reproduces the original unseen-bigram branch).
    Position 1 scores with the unigram term; the join strategy and
    micro-nat contract are the ladder's (see
    :func:`ngram_surprisal`)."""
    return ngram_surprisal(df, id_col, text_col, order=2, lam=lam)



def ngram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 5,
    lam: float = 0.75,
    count_floor: int = 1,
    floor_from: int = 3,
    smoothing: str = "jm",
) -> DataFrame:
    """Per-document interpolated ORDER-n language-model surprisal —
    the full recursive Jelinek-Mercer ladder; ``order=5`` is CCNet's
    published filter order (Wenzek et al. 2020 score with a 5-gram
    KenLM; Jelinek & Mercer 1980 define the interpolation).
    ``smoothing='kn'`` switches to interpolated MODIFIED KNESER-NEY
    (:func:`kn_ngram_surprisal` — the family KenLM itself estimates;
    ``lam``/``count_floor`` do not apply there and must stay at their
    defaults). The JM math:

    * ``p_1(w)            = c(w) / N``
    * ``p_k(w|ctx_{k-1})  = lam * c_k/c(ctx_{k-1}) + (1-lam) * p_{k-1}``

    Position i scores with ``p_min(i, order)`` (the ladder up to the
    available context). ``count_floor`` PRUNES every count table of
    order >= ``floor_from`` (keep counts >= floor) — the knob that
    keeps the high-order tables joinable at corpus scale: singleton
    n-grams dominate raw web text and carry almost no smoothing mass,
    and a pruned-away n-gram backs off to ``(1-lam) * p_{k-1}``
    exactly like an unseen one. Pruning is prefix-consistent — a
    k-gram's count never exceeds its (k-1)-gram context's count, so a
    surviving numerator always finds its denominator.

    Engine-exactness: the micro-nat contract (row-wise round of
    ``-ln p`` to integer micro-nats, exact BIGINT per-doc sum, one
    final division); every probability is ONE double expression of
    identical shape in Spark and DuckDB over integer counts.

    Scale shape: one projection builds (prev_{order-1}..prev_1, cur)
    tuples from the token array, one explode; the position stream
    MATERIALIZES once (localCheckpoint — it feeds order+1 consumers
    and Catalyst would otherwise re-run the tokenize/explode subtree
    per count table); the count tables aggregate the materialized
    stream and join back HINT-FREE — they are corpus-derived
    (distinct n-grams grow with corpus tokens; billions of rows at
    100 TB), so AQE picks broadcast at runtime while a table measures
    small and shuffle-joins with skew splitting past that; a
    corpus-derived table is NEVER broadcast on faith. (A measured
    broadcast gate — materialize the vocab table, count it, hint when
    min(v^k, N) is provably small — was built and REJECTED in round
    8: the extra gate pass cost more than the hints saved at every
    order, because AQE already converts these joins; BASELINE.md
    records the runs.) The corpus total is a one-row broadcast
    crossJoin. Cost is linear in ``order`` (one count aggregate + two
    joins per level) — the same ladder KenLM walks, distributed.

    Output: (id, n_tokens, surprisal)."""
    if smoothing not in ("jm", "kn"):
        raise ValueError(f"smoothing must be 'jm' or 'kn': {smoothing!r}")
    if smoothing == "kn":
        if count_floor != 1:
            raise ValueError(
                "count_floor does not apply to smoothing='kn': continuation"
                " counts are defined over the unpruned type inventory"
                " (store adjusted counts to prune a KN model — KenLM's"
                " separate prune pass)"
            )
        # reject (never silently ignore) the JM-only knobs: a caller
        # who "tuned" lam or floor_from must not get an unrelated model
        if lam != 0.75:
            raise ValueError(
                "lam does not apply to smoothing='kn': KN has no"
                " interpolation weight — discounts come from"
                " counts-of-counts (Chen & Goodman eq. 26)"
            )
        if floor_from != 3:
            raise ValueError(
                "floor_from does not apply to smoothing='kn' (no"
                " count-floor pruning in KN mode)"
            )
        return kn_ngram_surprisal(df, id_col, text_col, order=order)
    if order < 2:
        raise ValueError(f"order must be >= 2: {order}")
    if count_floor < 1:
        raise ValueError(f"count_floor must be >= 1: {count_floor}")
    if floor_from < 2:
        # the unigram table feeds the total-count denominator; floors
        # apply to higher-order tables only (matches write_lm_snapshot)
        raise ValueError(f"floor_from must be >= 2: {floor_from}")
    prevs = [f"prev{j}" for j in range(1, order)]  # prev1 = w[i-1], ...
    toks = (
        df.select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_w")
        )
        .filter(F.size("_w") > 0)
        # pre-explode repartition: the tuple explode below otherwise
        # runs at the scan's split count (see _lm_positions); the
        # shuffled payload is the compact (id, tokens) frame
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )

    def tuple_at(i: Column) -> Column:
        fields = [
            # element_at(_, 0) RAISES — lazy CASE guards for i <= j
            F.when(i > j, F.element_at("_w", i - j)).alias(f"prev{j}")
            for j in range(1, order)
        ]
        return F.struct(
            *fields,
            F.element_at("_w", i).alias("cur"),
            F.least(i, F.lit(order)).alias("pos"),
        )

    # the position stream feeds order+1 consumers (each count table +
    # the scoring join) and Catalyst recomputes the tokenize/explode
    # subtree per consumer — materialize it ONCE (localCheckpoint,
    # NOT persist: CacheManager matches by plan and would silently
    # turn repeated identical queries into cache hits). The
    # materialized stream is one row per corpus token — the same
    # order of bytes any shuffle of it would spill; executor-loss
    # recompute is the documented localCheckpoint trade.
    pos = (
        toks.select(
            "_id",
            F.explode(
                F.transform(F.sequence(F.lit(1), F.size("_w")), tuple_at)
            ).alias("_p"),
        )
        .select("_id", *[f"_p.{c}" for c in prevs], "_p.cur", "_p.pos")
        .localCheckpoint(eager=True)
    )

    # count table per order: keys_k = (prev_{k-1}..prev_1, cur)
    tables = {1: pos.groupBy("cur").agg(F.count(F.lit(1)).alias("_c1"))}
    for k in range(2, order + 1):
        keys = [f"prev{j}" for j in range(k - 1, 0, -1)] + ["cur"]
        t = (
            pos.filter(F.col("pos") >= k)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias(f"_c{k}"))
        )
        if k >= floor_from and count_floor > 1:
            t = t.filter(F.col(f"_c{k}") >= count_floor)
        tables[k] = t
    tot = tables[1].agg(F.sum("_c1").alias("_n_total"))

    # context table for level k = tables[k-1] re-keyed one slot up
    # (prev_j -> prev_{j+1}, cur -> prev_1), count aliased _x{k}.
    # The ctx join FOLDS onto the gram-sized count table instead of
    # the position stream: the ladder consumes _x{k} only through
    # coalesce(_c{k}/_x{k}, 0.0), so _x{k} matters ONLY when _c{k} is
    # non-null — and a surviving k-gram's context always survives its
    # own pruning (count(ctx) >= count(kgram) >= floor, the
    # prefix-consistency invariant above). One stream join per order
    # instead of two: at 100 TB that removes order-1 full shuffles of
    # the token stream (guide §2.3 "shuffle keys and metadata");
    # value-exact because unseen k-grams coalesce to 0.0 with or
    # without a matched context count.
    joined = pos.join(tables[1], "cur").crossJoin(F.broadcast(tot))
    for k in range(2, order + 1):
        keys = [f"prev{j}" for j in range(k - 1, 0, -1)] + ["cur"]
        ctx = tables[k - 1].select(
            *[
                F.col(f"prev{j}").alias(f"prev{j + 1}")
                for j in range(1, k - 1)
            ],
            F.col("cur").alias("prev1"),
            F.col(f"_c{k - 1}").alias(f"_x{k}"),
        )
        tk = tables[k].join(ctx, keys[:-1], "left")
        joined = joined.join(tk, keys, "left")

    p = F.col("_c1").cast("double") / F.col("_n_total")
    ladder = [p]
    for k in range(2, order + 1):
        p = F.lit(lam) * F.coalesce(
            F.col(f"_c{k}").cast("double") / F.col(f"_x{k}"), F.lit(0.0)
        ) + F.lit(1.0 - lam) * p
        ladder.append(p)
    expr = ladder[order - 1]
    for k in range(order - 1, 0, -1):
        expr = F.when(F.col("pos") == k, ladder[k - 1]).otherwise(expr)

    micro = joined.select(
        "_id", F.round(-F.log(expr) * 1e6, 0).cast("bigint").alias("_micro")
    )
    return (
        micro.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_micro") / F.count(F.lit(1)) / 1e6, 6).alias("surprisal"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "surprisal")
    )


# ---------------------------------------------------------------------------
# Frozen-LM snapshots — CCNet's ACTUAL usage: the filter scores crawl
# text against a 5-gram LM trained on a TARGET domain (Wikipedia in
# Wenzek et al. 2020 §4.2), not against the corpus's own statistics.
# The snapshot is the count tables as parquet (the dedup-snapshot /
# IVF-snapshot lifecycle pattern): write once, score any number of
# batches O(batch), append deltas O(delta).
# ---------------------------------------------------------------------------


def _lm_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    order: int,
    materialize: bool,
) -> DataFrame:
    """The (id, prev_{order-1}..prev_1, cur, pos) position stream the
    whole LM family scores over (pos = min(i, order), 1-based).
    ``materialize`` localCheckpoints it for multi-consumer plans
    (training builds ``order`` count tables from it); scoring a batch
    against a FROZEN snapshot has a single consumer and stays lazy.

    When materializing, the compact (id, tokens) frame repartitions to
    the cluster's parallelism BEFORE the order-wide tuple explode —
    the explode otherwise runs at the SCAN's split count (one small
    parquet file = one core doing the whole corpus's tuple build; the
    gopher_repetition pre-explode fix, measured there at 16x on a
    32-core box). The shuffled payload is the token arrays, never the
    exploded stream."""
    prevs = [f"prev{j}" for j in range(1, order)]
    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_w")
    ).filter(F.size("_w") > 0)
    if materialize:
        toks = toks.repartition(df.sparkSession.sparkContext.defaultParallelism)

    def tuple_at(i: Column) -> Column:
        fields = [
            # element_at(_, 0) RAISES — lazy CASE guards for i <= j
            F.when(i > j, F.element_at("_w", i - j)).alias(f"prev{j}")
            for j in range(1, order)
        ]
        return F.struct(
            *fields,
            F.element_at("_w", i).alias("cur"),
            F.least(i, F.lit(order)).alias("pos"),
        )

    pos = toks.select(
        "_id",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("_w")), tuple_at)
        ).alias("_p"),
    ).select("_id", *[f"_p.{c}" for c in prevs], "_p.cur", "_p.pos")
    return pos.localCheckpoint(eager=True) if materialize else pos


def _lm_table_keys(k: int) -> list[str]:
    return [f"prev{j}" for j in range(k - 1, 0, -1)] + ["cur"]


def write_lm_snapshot(
    corpus: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 3,
    count_floor: int = 1,
    floor_from: int = 3,
    smoothing: str = "jm",
    durable_derive: bool = False,
) -> dict:
    """Train and persist an order-n LM: one parquet count table per
    order (``{path}/t{k}`` with key columns + ``cnt``) plus
    ``{path}/meta`` (order, count_floor, floor_from, n_total,
    smoothing). With the default ``smoothing='jm'`` the tables are raw
    counts and ``count_floor`` prunes tables of order >=
    ``floor_from`` at WRITE time (KenLM prunes at build).
    ``smoothing='kn'`` persists the modified-Kneser-Ney model instead
    (:func:`kn_ngram_surprisal`'s math): ``t{k}`` hold ADJUSTED counts
    (raw at the top order, continuation counts below), ``c{k}`` the
    per-context totals/type-counts, and ``scal`` the one-row
    vocab/discount scalars — everything scoring needs, so a scoring
    batch never touches training text. KN rejects ``count_floor``
    (continuation counts are defined over the unpruned type
    inventory). The snapshot is the ONLY thing scoring needs — counts,
    never text. Returns ``{"order", "n_total"}``.

    Scale: the position stream materializes once and each table is
    one partial-combine aggregate of it (KN table writes submit
    concurrently — independent jobs); snapshot size is the distinct
    n-gram count (after pruning for JM, which the floor is the knob
    for). ``durable_derive=True`` (KN only) trades the single-wave
    write shape for the write-then-read pattern so the derived
    c{k}/scal jobs read durable t{k} parquet instead of executor-local
    checkpoint blocks — the preemptible-cluster arm (ADVICE r12; see
    :func:`_write_kn_snapshot`)."""
    import os

    if order < 2:
        raise ValueError(f"order must be >= 2: {order}")
    if count_floor < 1:
        raise ValueError(f"count_floor must be >= 1: {count_floor}")
    if floor_from < 2:
        # the unigram table is the OOV/total denominator — pruning it
        # would shift n_total and the 1/N floor away from a rebuild
        # (ADVICE r8); floors apply to higher-order tables only
        raise ValueError(f"floor_from must be >= 2: {floor_from}")
    if smoothing not in ("jm", "kn"):
        raise ValueError(f"smoothing must be 'jm' or 'kn': {smoothing!r}")
    if smoothing == "kn":
        if count_floor != 1:
            raise ValueError(
                "count_floor does not apply to smoothing='kn' snapshots"
                " (continuation counts need the unpruned type inventory)"
            )
        return _write_kn_snapshot(
            corpus, path, id_col, text_col, order,
            durable_derive=durable_derive,
        )
    if durable_derive:
        # reject rather than silently ignore: the JM arm has no derived
        # second wave — its t{k} writes are the only jobs and they read
        # the position-stream checkpoint, so there is nothing to make
        # durable ahead of them
        raise ValueError(
            "durable_derive applies only to smoothing='kn' (the JM arm"
            " has no derived write wave)"
        )
    pos = _lm_positions(corpus, id_col, text_col, order, materialize=True)
    # The per-order count tables all derive from the SAME materialized
    # position stream and are independent of each other — submit the
    # writes from a thread pool so their jobs overlap instead of each
    # paying its scheduling + tail latency in sequence (guide §2.6;
    # the KN arm's t{k} writes already did this).
    from concurrent.futures import ThreadPoolExecutor

    tables: list[tuple[str, DataFrame]] = [
        ("t1", pos.groupBy("cur").agg(F.count(F.lit(1)).alias("cnt")))
    ]
    for k in range(2, order + 1):
        t = (
            pos.filter(F.col("pos") >= k)
            .groupBy(*_lm_table_keys(k))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if k >= floor_from and count_floor > 1:
            t = t.filter(F.col("cnt") >= count_floor)
        tables.append((f"t{k}", t))

    def _write_table(item: tuple[str, DataFrame]) -> None:
        sub, df_k = item
        df_k.write.mode("overwrite").parquet(os.path.join(path, sub))

    # n_total == sum(t1.cnt) == the position-stream row count by
    # construction (t1 groups EVERY pos row by cur) — count the
    # checkpointed stream concurrently WITH the table writes instead
    # of reading t1's parquet back afterwards (one fewer read-back
    # job + footer listing on the write path)
    with ThreadPoolExecutor(max_workers=len(tables) + 1) as pool:
        n_total_f = pool.submit(pos.count)
        list(pool.map(_write_table, tables))
        n_total = int(n_total_f.result())
    spark = corpus.sparkSession
    _write_lm_meta(spark, path, order, count_floor, floor_from, n_total, "jm")
    return {"order": order, "n_total": n_total}


def _write_lm_meta(
    spark: SparkSession,
    path: str,
    order: int,
    count_floor: int,
    floor_from: int,
    n_total: int,
    smoothing: str,
) -> None:
    import os

    spark.createDataFrame(
        [(order, count_floor, floor_from, n_total, smoothing)],
        "order int, count_floor int, floor_from int, n_total long,"
        " smoothing string",
        # repartition(1): a bare 1-row createDataFrame parallelizes to
        # defaultParallelism slices -> 32 write tasks / 32 files (31
        # empty), and every later meta READ pays the 32-footer listing
        # (write_bpe_model's measured LocalRelation pathology)
    ).repartition(1).write.mode("overwrite").parquet(
        os.path.join(path, "meta")
    )


def _lm_meta_smoothing(meta) -> str:
    """Smoothing family recorded in a snapshot's meta row; snapshots
    written before the field existed are JM by construction."""
    return (
        meta["smoothing"]
        if "smoothing" in getattr(meta, "__fields__", ())
        and meta["smoothing"] is not None
        else "jm"
    )


def _kn_adjusted_tables(pos, order: int) -> dict[int, DataFrame]:
    """LAZY modified-KN adjusted-count tables a_k from a position
    stream: RAW counts at the top order, CONTINUATION counts (distinct
    left-extension types among raw (k+1)-gram types) below — the one
    subtle convention in the KN math, defined in exactly one place so
    in-plan scoring (:func:`kn_ngram_surprisal`) and frozen snapshots
    (:func:`_write_kn_snapshot`) can never drift."""
    raw: dict[int, DataFrame] = {}
    for k in range(2, order + 1):
        raw[k] = (
            pos.filter(F.col("pos") >= k)
            .groupBy(*_lm_table_keys(k))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    adj: dict[int, DataFrame] = {order: raw[order]}
    for k in range(1, order):
        adj[k] = (
            raw[k + 1]
            .groupBy(*_lm_table_keys(k))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return adj


def _kn_adjusted_checkpointed(pos, order: int) -> dict[int, DataFrame]:
    """Materialized :func:`_kn_adjusted_tables`: every a_k as an eager
    localCheckpoint (each feeds three consumers — numerator join,
    per-context aggregate, counts-of-counts — whose per-consumer
    pruning defeats ReuseExchange, the r12 finding).

    One structural improvement over checkpointing the lazy dict
    directly: a_{order} IS the raw top-order table and a_{order-1}
    re-aggregates that same raw table (continuation counts = counts of
    raw (order)-gram TYPES), so the lazy plans computed the TOP-ORDER
    STREAM AGGREGATE TWICE — once for a_{order}'s checkpoint and once
    inside a_{order-1}'s. The top table now checkpoints FIRST and
    a_{order-1} aggregates the checkpoint (value-exact — same rows,
    same grouping); the remaining orders' aggregates still submit
    concurrently (guide §2.6). At 100 TB this removes one full
    aggregation of the token stream per KN train/score (the largest of
    the ladder — top-order keys are the widest)."""
    from concurrent.futures import ThreadPoolExecutor

    top = (
        pos.filter(F.col("pos") >= order)
        .groupBy(*_lm_table_keys(order))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    lazy: dict[int, DataFrame] = {
        order - 1: top.groupBy(*_lm_table_keys(order - 1)).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    }
    for k in range(1, order - 1):
        raw_k1 = (
            pos.filter(F.col("pos") >= k + 1)
            .groupBy(*_lm_table_keys(k + 1))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        lazy[k] = raw_k1.groupBy(*_lm_table_keys(k)).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    adj: dict[int, DataFrame] = {order: top}
    with ThreadPoolExecutor(max_workers=max(len(lazy), 1)) as pool:
        adj.update(
            zip(
                lazy.keys(),
                pool.map(
                    lambda d: d.localCheckpoint(eager=True), lazy.values()
                ),
            )
        )
    return adj


def _write_kn_snapshot(
    corpus: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    order: int,
    durable_derive: bool = False,
) -> dict:
    """KN arm of :func:`write_lm_snapshot`: persist adjusted count
    tables ``t{k}``, per-context aggregates ``c{k}``, and the one-row
    vocab/discount scalar table ``scal``.

    ``durable_derive=False`` (default) holds the adjusted tables as
    executor-local localCheckpoint blocks through the whole derived
    write wave — the fastest shape (one aggregate wave, one concurrent
    write wave), but an executor loss mid-write fails the entire
    snapshot build (ADVICE r12). ``durable_derive=True`` opts into the
    write-then-read pattern for very long-running builds on
    preemptible clusters: the t{k} parquet writes land FIRST and the
    c{k}/scal derivation reads the already-durable files back, so an
    executor loss after the t-wave only re-runs the in-flight derived
    job (the cost is the re-added read-back barrier plus one extra
    pass over the top-order table)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    spark = corpus.sparkSession
    pos = _lm_positions(corpus, id_col, text_col, order, materialize=True)
    if pos.isEmpty():
        # V=0 would make the ladder's uniform 1/V base undefined for
        # every FUTURE batch scored against the snapshot (ANSI
        # DIVIDE_BY_ZERO at score time, long after the write
        # "succeeded") — refuse up front; KenLM likewise rejects
        # empty input. The JM arm stays well-defined on empty corpora
        # (its OOV floor caps the denominator at 1).
        raise ValueError(
            "cannot write a smoothing='kn' snapshot from an empty"
            " training corpus: the KN uniform base is 1/V and V=0;"
            " use smoothing='jm' if degenerate corpora must score"
        )
    # materialize the adjusted tables ONCE (localCheckpoint via
    # _kn_adjusted_checkpointed — top order first, the rest
    # concurrently; r13 removed the duplicated top-order stream
    # aggregate): every t{k}, c{k} and scal column derives from them,
    # so a single checkpoint phase replaces the old write-t{k} ->
    # read-back-parquet barrier (two sequential job waves + a parquet
    # round-trip) with one wave of aggregates and ONE concurrent wave
    # of writes below (guide §2.6). The checkpoints are
    # distinct-n-gram-sized — the artifact class being persisted
    # anyway.
    adj = _kn_adjusted_checkpointed(pos, order)

    if durable_derive:
        # preemptible-cluster arm: land the t{k} parquet first (one
        # concurrent wave from the checkpoints), then re-point every
        # derived aggregate at the DURABLE files — from here on an
        # executor loss can only cost the in-flight derived job, never
        # the adjusted tables themselves
        def _write_t(item: tuple[int, DataFrame]) -> None:
            k, df_k = item
            df_k.write.mode("overwrite").parquet(
                os.path.join(path, f"t{k}")
            )

        with ThreadPoolExecutor(max_workers=order) as pool:
            list(pool.map(_write_t, adj.items()))
        adj = {
            k: spark.read.parquet(os.path.join(path, f"t{k}"))
            for k in range(1, order + 1)
        }
        derived: list[tuple[str, DataFrame]] = []
    else:
        derived = [(f"t{k}", adj[k]) for k in range(1, order + 1)]
    for k in range(2, order + 1):
        keys = _lm_table_keys(k)
        ctx = adj[k].groupBy(*keys[:-1]).agg(
            F.sum("cnt").alias(f"_tot{k}"),
            F.sum((F.col("cnt") == 1).cast("bigint")).alias(f"_n1_{k}"),
            F.sum((F.col("cnt") == 2).cast("bigint")).alias(f"_n2_{k}"),
            F.sum((F.col("cnt") >= 3).cast("bigint")).alias(f"_n3p_{k}"),
        )
        derived.append((f"c{k}", ctx))
    scalars = pos.agg(
        F.countDistinct("cur").alias("_V"),
        F.count(F.lit(1)).alias("_n_tokens"),
    ).crossJoin(
        adj[1].agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("_tot1"),
            F.coalesce(
                F.sum((F.col("cnt") == 1).cast("bigint")), F.lit(0)
            ).alias("_n1_1"),
            F.coalesce(
                F.sum((F.col("cnt") == 2).cast("bigint")), F.lit(0)
            ).alias("_n2_1"),
            F.coalesce(
                F.sum((F.col("cnt") >= 3).cast("bigint")), F.lit(0)
            ).alias("_n3p_1"),
        )
    )
    for k in range(1, order + 1):
        scalars = scalars.crossJoin(_kn_count_of_counts(adj[k], k))
    scalars = scalars.select(
        "*",
        *[
            F.expr(text).alias(name)
            for k in range(1, order + 1)
            for name, text in kn_discount_sql(k).items()
        ],
    )
    derived.append(("scal", scalars))

    def _write_derived(item: tuple[str, DataFrame]) -> None:
        sub, df_k = item
        df_k.write.mode("overwrite").parquet(os.path.join(path, sub))

    # n_total == scal._n_tokens == the checkpointed position-stream
    # row count — counted concurrently with the writes instead of
    # reading scal's parquet back afterwards
    with ThreadPoolExecutor(max_workers=len(derived) + 1) as pool:
        n_total_f = pool.submit(pos.count)
        list(pool.map(_write_derived, derived))
        n_total = int(n_total_f.result())
    _write_lm_meta(spark, path, order, 1, order, n_total, "kn")
    return {"order": order, "n_total": n_total}


def score_with_lm_snapshot(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Score a batch against a FROZEN :func:`write_lm_snapshot` LM —
    the CCNet shape (domain-LM surprisal over crawl text). Identical
    ladder and micro-nat contract as :func:`ngram_surprisal`, with one
    frozen-LM addition: an out-of-vocabulary unigram scores as count 1
    (the minimal Laplace floor — KenLM's <unk> with a deterministic,
    engine-exact probability of 1/N; unseen higher-order grams back
    off exactly as in self-scoring). Output: (id, n_tokens,
    surprisal).

    Scale: the batch's position stream has a SINGLE consumer (the
    scoring join chain), so it stays lazy — scoring is one pass over
    the batch joined against snapshot parquet, hint-free (AQE
    broadcasts the tables while they measure small; a web-scale
    snapshot shuffle-joins like any equi-join).

    A ``smoothing='kn'`` snapshot scores with the modified-Kneser-Ney
    ladder instead (``lam`` is ignored): adjusted counts + per-context
    aggregates + the frozen discount scalars, with OOV mass falling
    out of the math itself — an unseen token takes the gamma-chained
    uniform ``1/V`` of the TRAINING vocab, no Laplace floor needed."""
    import os

    spark = df.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    order = int(meta["order"])
    if _lm_meta_smoothing(meta) == "kn":
        return _score_kn_snapshot(df, path, id_col, text_col, order)
    # an LM trained on an EMPTY corpus has n_total 0; every scored
    # position is then OOV-floored to count 1, and the denominator
    # clamps to 1 so the score is a well-defined 0 nats instead of an
    # ANSI divide-by-zero job failure (degenerate-input rule, same as
    # mixture_weights' guards)
    n_total = max(int(meta["n_total"]), 1)
    pos = _lm_positions(df, id_col, text_col, order, materialize=False)
    t1 = spark.read.parquet(os.path.join(path, "t1")).select(
        "cur", F.col("cnt").alias("_c1")
    )
    joined = pos.join(t1, "cur", "left")
    for k in range(2, order + 1):
        keys = _lm_table_keys(k)
        tk = spark.read.parquet(os.path.join(path, f"t{k}"))
        prev_t = spark.read.parquet(
            os.path.join(path, f"t{k - 1}")
        )
        prev_keys = _lm_table_keys(k - 1)
        ctx = prev_t.select(
            *[
                F.col(prev_keys[i]).alias(keys[i])
                for i in range(len(prev_keys))
            ],
            F.col("cnt").alias(f"_x{k}"),
        )
        # ctx folds onto the gram-sized count table, not the batch's
        # position stream (ngram_surprisal's fold — _x{k} is consumed
        # only when _c{k} matched, and a stored k-gram's context is
        # always stored: the write-time floor is prefix-consistent).
        # One stream join per order; the ctx join is count-table ⋈
        # count-table, the artifact class, never the token stream.
        tk2 = tk.select(*keys, F.col("cnt").alias(f"_c{k}")).join(
            ctx, keys[:-1], "left"
        )
        joined = joined.join(tk2, keys, "left")

    p = F.coalesce(F.col("_c1"), F.lit(1)).cast("double") / F.lit(n_total)
    ladder = [p]
    for k in range(2, order + 1):
        p = F.lit(lam) * F.coalesce(
            F.col(f"_c{k}").cast("double") / F.col(f"_x{k}"), F.lit(0.0)
        ) + F.lit(1.0 - lam) * p
        ladder.append(p)
    expr = ladder[order - 1]
    for k in range(order - 1, 0, -1):
        expr = F.when(F.col("pos") == k, ladder[k - 1]).otherwise(expr)

    micro = joined.select(
        "_id", F.round(-F.log(expr) * 1e6, 0).cast("bigint").alias("_micro")
    )
    return (
        micro.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_micro") / F.count(F.lit(1)) / 1e6, 6).alias(
                "surprisal"
            ),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "surprisal")
    )


def _score_kn_snapshot(
    df: DataFrame, path: str, id_col: str, text_col: str, order: int
) -> DataFrame:
    """KN arm of :func:`score_with_lm_snapshot`: the identical join
    chain and F.expr ladder as :func:`kn_ngram_surprisal`, reading the
    frozen ``t{k}``/``c{k}``/``scal`` parquet instead of in-plan
    aggregates. Single-consumer position stream, stays lazy."""
    import os

    spark = df.sparkSession
    pos = _lm_positions(df, id_col, text_col, order, materialize=False)
    joined = pos
    for k in range(1, order + 1):
        keys = _lm_table_keys(k)
        tk = spark.read.parquet(os.path.join(path, f"t{k}"))
        joined = joined.join(
            tk.select(*keys, F.col("cnt").alias(f"_a{k}")), keys, "left"
        )
        if k >= 2:
            ck = spark.read.parquet(os.path.join(path, f"c{k}"))
            joined = joined.join(ck, keys[:-1], "left")
    scal = spark.read.parquet(os.path.join(path, "scal"))
    scal_row = scal.first()
    if scal_row is None or int(scal_row["_V"]) == 0:
        # snapshots written before the write-time guard existed can
        # carry V=0; fail actionably instead of a per-row ANSI
        # DIVIDE_BY_ZERO deep inside the ladder expression
        raise ValueError(
            f"KN snapshot at {path} was trained on an empty corpus"
            " (V=0) — retrain with write_lm_snapshot on non-empty text"
        )
    joined = joined.crossJoin(F.broadcast(scal))
    micro = joined.select(
        "_id",
        F.expr(
            f"CAST(round(-ln({kn_ladder_sql(order)}) * 1e6, 0) AS BIGINT)"
        ).alias("_micro"),
    )
    return (
        micro.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_micro") / F.count(F.lit(1)) / 1e6, 6).alias(
                "surprisal"
            ),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "surprisal")
    )


def append_lm_snapshot(
    delta: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Fold a delta corpus into an existing LM snapshot O(delta): the
    delta's UNFLOORED count tables merge (key-summed) with the stored
    ones, the write-time floor re-applies to the merged counts (orders
    >= ``floor_from``, never the unigram table), and the new tables
    publish in two stages: ALL Spark work first (every merged table —
    including the new meta — lands in ``t{k}__new`` staging dirs while
    the live snapshot stays untouched and readable), then one tight
    rename loop swaps everything in. The swap loop is milliseconds of
    pure renames with no job inside it, but it is NOT atomic across
    tables — a crash inside that loop leaves a torn snapshot with the
    remaining ``__new`` dirs alongside for recovery (true atomicity
    needs a versioned directory + single pointer publish; the staging
    dirs make manual repair a rename, never a recompute). With
    ``count_floor=1`` the result is EXACTLY the snapshot a full
    rebuild on the union would produce (pinned in tests); with a
    floor > 1, counts pruned by an EARLIER write cannot resurface —
    the standard pruned-LM approximation, documented rather than
    hidden (exact appendability requires storing unpruned tables)."""
    import os
    import shutil

    spark = delta.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    if _lm_meta_smoothing(meta) == "kn":
        raise ValueError(
            "append is not supported for smoothing='kn' snapshots:"
            " continuation counts and counts-of-counts discounts do not"
            " merge incrementally from adjusted tables (KenLM rebuilds"
            " too) — retrain with write_lm_snapshot on the union, or use"
            " a JM snapshot where appends are O(delta)"
        )
    order = int(meta["order"])
    count_floor = int(meta["count_floor"])
    floor_from = int(meta["floor_from"])
    pos = _lm_positions(delta, id_col, text_col, order, materialize=True)

    # ---- stage: ALL expensive work writes to __new dirs; the live
    # snapshot is still complete and consistent if anything here fails.
    # The per-order merges are independent (each reads its own live
    # table + the checkpointed delta positions), so the staging writes
    # submit from a thread pool and overlap (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    staged: list[tuple[str, str]] = []
    staged_writes: list[tuple[str, DataFrame]] = []
    for k in range(1, order + 1):
        keys = _lm_table_keys(k)
        d = (
            pos.filter(F.col("pos") >= k) if k > 1 else pos
        ).groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
        merged = (
            spark.read.parquet(os.path.join(path, f"t{k}"))
            .unionByName(d)
            .groupBy(*keys)
            .agg(F.sum("cnt").alias("cnt"))
        )
        # floor never applies to t1 (k starts at floor_from >= 2 by
        # write-time validation; max() keeps a legacy floor_from=1
        # meta from pruning the unigram/OOV denominator — ADVICE r8)
        if k >= max(floor_from, 2) and count_floor > 1:
            merged = merged.filter(F.col("cnt") >= count_floor)
        new_dir = os.path.join(path, f"t{k}__new")
        staged_writes.append((new_dir, merged))
        staged.append((new_dir, os.path.join(path, f"t{k}")))

    def _write_staged(item: tuple[str, DataFrame]) -> None:
        new_dir_k, df_k = item
        df_k.write.mode("overwrite").parquet(new_dir_k)

    with ThreadPoolExecutor(max_workers=len(staged_writes)) as pool:
        list(pool.map(_write_staged, staged_writes))
    row = (
        spark.read.parquet(staged[0][0]).agg(F.sum("cnt")).first()[0]
    )
    n_total = int(row) if row is not None else 0
    meta_new = os.path.join(path, "meta__new")
    spark.createDataFrame(
        [(order, count_floor, floor_from, n_total)],
        "order int, count_floor int, floor_from int, n_total long",
    ).repartition(1).write.mode("overwrite").parquet(meta_new)
    staged.append((meta_new, os.path.join(path, "meta")))

    # ---- publish: tight rename loop, no Spark work inside
    for new_dir, live_dir in staged:
        shutil.rmtree(live_dir)
        os.replace(new_dir, live_dir)
    return {"order": order, "n_total": n_total}


def trigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    count_floor: int = 1,
) -> DataFrame:
    """Order-3 rung of :func:`ngram_surprisal` (kept as a named
    operator: the trigram scorer is the cheapest order that sees past
    bigram structure, and its oracle/pins gate the shared ladder).
    ``count_floor`` prunes the trigram table only (floor_from=3)."""
    return ngram_surprisal(
        df, id_col, text_col, order=3, lam=lam, count_floor=count_floor
    )


# ---------------------------------------------------------------------------
# Modified Kneser-Ney smoothing (Chen & Goodman 1998 §3, the family
# KenLM estimates and therefore what CCNet's published filter actually
# scores with — Wenzek et al. 2020 §4.2). The Jelinek-Mercer ladder
# above stays the oracle-simple default; smoothing='kn' switches the
# ladder to discounted continuation counts:
#
#   p_k(w|ctx) = max(a_k(ctx·w) - D_k(a_k), 0) / A_k(ctx)
#              + gamma_k(ctx) * p_{k-1}(w|ctx')        (ctx seen)
#   p_k(w|ctx) = p_{k-1}(w|ctx')                       (ctx unseen)
#   p_1(w)     = disc(a_1(w)) / A_1 + gamma_1 * (1/V)  (uniform base)
#
# where a_k is the RAW count at the top order and the CONTINUATION
# count (distinct left-extension types of the k-gram among raw
# (k+1)-gram types) below it; A_k(ctx) = sum_w a_k(ctx·w);
# gamma_k(ctx) = (D1*N1(ctx) + D2*N2(ctx) + D3*N3+(ctx)) / A_k(ctx)
# with Nr(ctx) = #types at adjusted count r (3+ = at least 3); and the
# three per-order discounts come from counts-of-counts n1..n4 over a_k
# (Chen & Goodman eq. 26): Y = n1/(n1+2n2), D1 = 1-2Y*n2/n1,
# D2 = 2-3Y*n3/n2, D3 = 3-4Y*n4/n3. Degenerate corpora where a
# formula is undefined (n_r = 0) fall back to KenLM's
# --discount_fallback defaults (0.5/1.0/1.5) and every D_r clamps into
# [0, r] — a deterministic, engine-replicable version of the estimate
# KenLM refuses to compute.
#
# Engine-exactness strategy: the ladder, gamma, and discount formulas
# are generated ONCE as SQL text below; the Spark operator applies the
# identical text via F.expr over identically-named join columns, and
# the DuckDB oracle embeds the same text in its CTE chain — the double
# arithmetic is the same expression tree in both engines, so the
# micro-nat contract holds bit-for-bit.
#
# Convention notes (documented engine semantics, not paper deviations
# hidden as bugs): no <s> padding — position i scores with the
# order-min(i, n) distribution, exactly like the JM ladder; a k-gram
# seen only at document starts has no left extension and therefore
# continuation count 0 (it backs off like an unseen gram).
# ---------------------------------------------------------------------------


def _kn_disc_term(k: int) -> str:
    """SQL text for ``max(a - D(a), 0)``: the discounted numerator at
    order ``k`` over the joined adjusted-count column ``_a{k}``
    (NULL = unseen gram -> 0; counts are >= 1 by construction, and the
    [0, r] clamp on D_r makes a - D(a) non-negative)."""
    a = f"_a{k}"
    return (
        f"CASE WHEN {a} IS NULL THEN 0.0"
        f" WHEN {a} = 1 THEN 1.0 - _d1_{k}"
        f" WHEN {a} = 2 THEN 2.0 - _d2_{k}"
        f" ELSE CAST({a} AS DOUBLE) - _d3_{k} END"
    )


def _kn_gamma_num(k: int) -> str:
    """SQL text for the backoff-mass numerator
    ``D1*N1 + D2*N2 + D3*N3+`` at order ``k``."""
    return (
        f"(_d1_{k} * CAST(_n1_{k} AS DOUBLE)"
        f" + _d2_{k} * CAST(_n2_{k} AS DOUBLE)"
        f" + _d3_{k} * CAST(_n3p_{k} AS DOUBLE))"
    )


def kn_ladder_sql(order: int) -> str:
    """SQL text of the full interpolated modified-KN ladder, selected
    per position by ``pos`` (min(i, order) available context). Levels
    factor as ``disc_part + cont_part * p_lower`` so the lower level
    appears ONCE per rung (linear, not exponential, text growth); the
    unseen-context rung is ``0.0 + 1.0 * p_lower`` which is IEEE-exact
    ``p_lower`` for the positive probabilities the ladder produces."""
    p = (
        f"CASE WHEN _tot1 > 0 THEN ({_kn_disc_term(1)}) / _tot1"
        f" + ({_kn_gamma_num(1)} / _tot1) * (1.0 / _V)"
        f" ELSE 1.0 / _V END"
    )
    ladder = [p]
    for k in range(2, order + 1):
        disc_part = (
            f"CASE WHEN _tot{k} IS NULL THEN 0.0"
            f" ELSE ({_kn_disc_term(k)}) / _tot{k} END"
        )
        cont_part = (
            f"CASE WHEN _tot{k} IS NULL THEN 1.0"
            f" ELSE {_kn_gamma_num(k)} / _tot{k} END"
        )
        p = f"({disc_part}) + ({cont_part}) * ({p})"
        ladder.append(p)
    return (
        "CASE "
        + " ".join(
            f"WHEN pos = {k} THEN {ladder[k - 1]}" for k in range(1, order)
        )
        + f" ELSE {ladder[order - 1]} END"
    )


def kn_discount_sql(k: int) -> dict[str, str]:
    """SQL texts computing the order-``k`` discounts ``_d1_{k}``,
    ``_d2_{k}``, ``_d3_{k}`` from the counts-of-counts columns
    ``_cn1_{k}``..``_cn4_{k}`` (types at adjusted count exactly
    1..4) — Chen & Goodman eq. 26 with the documented fallback rules
    for degenerate corpora: when the formula is undefined (n_r = 0) OR
    computes a non-positive discount, D_r takes KenLM's
    --discount_fallback default (0.5/1.0/1.5). A discount clamped to
    ZERO would be worse than inexact — a context holding only
    count-r types would then carry zero backoff mass and every unseen
    continuation in it would score probability 0 (ln(0) — the exact
    estimation failure KenLM refuses with "could not calculate
    Kneser-Ney discounts"). The upper clamp at r keeps the discounted
    numerator non-negative."""

    def rule(r: int, fb: str, formula: str) -> str:
        return (
            f"CASE WHEN _cn{r}_{k} = 0 THEN {fb}"
            f" WHEN ({formula}) <= 0.0 THEN {fb}"
            f" ELSE least({r}.0, {formula}) END"
        )

    y = (
        f"CASE WHEN _cn1_{k} + 2 * _cn2_{k} > 0"
        f" THEN CAST(_cn1_{k} AS DOUBLE) / (_cn1_{k} + 2 * _cn2_{k})"
        f" ELSE 0.0 END"
    )
    return {
        f"_d1_{k}": rule(
            1, "0.5", f"1.0 - 2.0 * ({y}) * _cn2_{k} / _cn1_{k}"
        ),
        f"_d2_{k}": rule(
            2, "1.0", f"2.0 - 3.0 * ({y}) * _cn3_{k} / _cn2_{k}"
        ),
        f"_d3_{k}": rule(
            3, "1.5", f"3.0 - 4.0 * ({y}) * _cn4_{k} / _cn3_{k}"
        ),
    }


def _kn_count_of_counts(adj: DataFrame, k: int) -> DataFrame:
    """One-row counts-of-counts (types at adjusted count exactly
    1..4) over an order-``k`` adjusted-count table."""
    return adj.agg(
        *[
            F.coalesce(
                F.sum((F.col("cnt") == r).cast("bigint")), F.lit(0)
            ).alias(f"_cn{r}_{k}")
            for r in (1, 2, 3, 4)
        ]
    )


def kn_ngram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 5,
) -> DataFrame:
    """Per-document interpolated MODIFIED KNESER-NEY order-n
    surprisal — the smoothing family behind CCNet's published KenLM
    filter (see the block comment above for the math, fallbacks, and
    engine-exactness strategy). Output: (id, n_tokens, surprisal),
    the same contract as :func:`ngram_surprisal`.

    Scale shape: the position stream materializes once
    (localCheckpoint — it feeds the raw count tables and the scoring
    join); raw tables r_k are one partial-combine aggregate each;
    adjusted (continuation) tables a_k re-aggregate r_{k+1} — counts
    of TYPES, so their input is already distinct-gram-sized, far
    smaller than the token stream; per-context totals and the
    counts-of-counts/discount scalars aggregate a_k. All scoring
    joins are HINT-FREE equi-joins on gram columns (corpus-derived
    tables are never broadcast on faith — AQE converts while small);
    the only broadcast is the one-row discount/global-scalar row.
    Count-floor pruning is NOT offered in KN mode: continuation
    counts are defined over the unpruned type inventory, and KenLM's
    prune pass stores adjusted counts precisely because floors do not
    commute with them."""
    if order < 2:
        raise ValueError(f"order must be >= 2: {order}")
    pos = _lm_positions(df, id_col, text_col, order, materialize=True)

    # adjusted counts from the SHARED builder (_kn_adjusted_tables —
    # raw at the top order, continuation below; r_1 is never needed:
    # the unigram level uses continuation counts and V comes from pos).
    # Each a_k feeds THREE consumers (numerator join, per-context
    # aggregate, counts-of-counts), and per-consumer column pruning
    # makes the three subplans differ so ReuseExchange never fires —
    # a lazy plan re-runs the agg-over-corpus subtree per consumer
    # (measured 5.3x vs DuckDB at sf0.1). Materialize each a_k ONCE
    # via localCheckpoint (top order first — it feeds a_{order-1}'s
    # aggregate, the r13 duplicate-stream-aggregate fix — the rest
    # submitted CONCURRENTLY from a thread pool: Spark's scheduler
    # runs jobs from separate threads in parallel, so the wall cost is
    # the largest table's aggregate, not the sum — sequential eager
    # checkpoints measured WORSE than the lazy plan, 12.7s vs 9.6s,
    # because each small job underutilizes the cluster). The
    # checkpointed tables are distinct-n-gram-sized — the artifact
    # class any shuffle of them would spill at 100 TB.
    adj = _kn_adjusted_checkpointed(pos, order)

    # one-row scalar table: V, the global unigram context aggregate,
    # counts-of-counts for every order, then the discount columns —
    # bounded by construction (a single row), the one broadcast here
    scalars = pos.agg(F.countDistinct("cur").alias("_V")).crossJoin(
        adj[1].agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("_tot1"),
            F.coalesce(
                F.sum((F.col("cnt") == 1).cast("bigint")), F.lit(0)
            ).alias("_n1_1"),
            F.coalesce(
                F.sum((F.col("cnt") == 2).cast("bigint")), F.lit(0)
            ).alias("_n2_1"),
            F.coalesce(
                F.sum((F.col("cnt") >= 3).cast("bigint")), F.lit(0)
            ).alias("_n3p_1"),
        )
    )
    for k in range(1, order + 1):
        scalars = scalars.crossJoin(_kn_count_of_counts(adj[k], k))
    scalars = scalars.select(
        "*",
        *[
            F.expr(text).alias(name)
            for k in range(1, order + 1)
            for name, text in kn_discount_sql(k).items()
        ],
    )

    joined = pos
    for k in range(1, order + 1):
        keys = _lm_table_keys(k)
        joined = joined.join(
            adj[k].select(*keys, F.col("cnt").alias(f"_a{k}")), keys, "left"
        )
        if k >= 2:
            ctx = adj[k].groupBy(*keys[:-1]).agg(
                F.sum("cnt").alias(f"_tot{k}"),
                F.sum((F.col("cnt") == 1).cast("bigint")).alias(f"_n1_{k}"),
                F.sum((F.col("cnt") == 2).cast("bigint")).alias(f"_n2_{k}"),
                F.sum((F.col("cnt") >= 3).cast("bigint")).alias(f"_n3p_{k}"),
            )
            joined = joined.join(ctx, keys[:-1], "left")
    joined = joined.crossJoin(F.broadcast(scalars))

    micro = joined.select(
        "_id",
        F.expr(
            f"CAST(round(-ln({kn_ladder_sql(order)}) * 1e6, 0) AS BIGINT)"
        ).alias("_micro"),
    )
    return (
        micro.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_micro") / F.count(F.lit(1)) / 1e6, 6).alias(
                "surprisal"
            ),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "surprisal")
    )


# ---------------------------------------------------------------------------
# C4 document-level blocklist filter (Raffel et al. 2020 §2.2 drop
# any page containing a word from a public blocklist — a separate
# step from the line-level rules above)
# ---------------------------------------------------------------------------


def badwords_filter(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document blocklist gate: count WHOLE-WORD occurrences of
    the blocklisted terms (C4 matches words, not substrings — 'class'
    must not trip an 'ass' entry) and keep documents with zero hits.
    Output: (id, n_hits, keep).

    Pure Column expression — one tokenize + one array-filter
    membership test per row, zero shuffle, fully inside codegen. The
    blocklist is a literal (dimension-sized by nature: the published
    lists are a few hundred entries); for multi-thousand-entry lists
    the same shape holds, the IN list just grows."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(F.col(text_col))
    n_hits = F.size(F.filter(toks, lambda w: w.isin([t.lower() for t in terms])))
    return df.select(
        F.col(id_col),
        n_hits.cast("long").alias("n_hits"),
        (n_hits == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# FineWeb custom quality filters (Penedo et al. 2024, arXiv:2406.17557 §3.6)
# ---------------------------------------------------------------------------

#: Threshold defaults follow the datatrove FineWebQualityFilter that
#: accompanies the paper (line_punct_thr / short_line_thr+length /
#: char_duplicates_ratio / new_line_ratio); every deployment retunes
#: them, so they are parameters here. Boundary directions are
#: documented on :func:`fineweb_quality` and shared with the oracle.
FINEWEB_LINE_PUNCT_THR = 0.12
FINEWEB_SHORT_LINE_THR = 0.67
FINEWEB_SHORT_LINE_LENGTH = 30
FINEWEB_CHAR_DUP_THR = 0.01
FINEWEB_NEW_LINE_THR = 0.3
#: Line-terminal punctuation (the C4/datatrove stop-char set).
FINEWEB_STOP_CHARS = (".", "'", '"', "!", "?")


def fineweb_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_punct_thr: float = FINEWEB_LINE_PUNCT_THR,
    short_line_thr: float = FINEWEB_SHORT_LINE_THR,
    short_line_length: int = FINEWEB_SHORT_LINE_LENGTH,
    char_dup_thr: float = FINEWEB_CHAR_DUP_THR,
    new_line_thr: float = FINEWEB_NEW_LINE_THR,
) -> DataFrame:
    """The FineWeb paper's three custom line filters plus its
    new-line-ratio rule — the quality pass FineWeb adds ON TOP of the
    Gopher/C4 batteries this repo already implements:

    * ``end_punct_frac`` — fraction of (trim-nonempty) lines ending in
      a stop char; keep requires ``> line_punct_thr`` (a page whose
      lines rarely end in punctuation is nav/boilerplate).
    * ``short_line_frac`` — fraction of lines of at most
      ``short_line_length`` chars; keep requires ``< short_line_thr``
      (link farms are walls of short lines).
    * ``dup_line_char_frac`` — character mass of duplicate line
      occurrences over line char mass (the Gopher element-mass
      spelling, documented there); keep requires ``< char_dup_thr``.
    * ``new_line_ratio`` — newline count over word count; keep
      requires ``< new_line_thr`` (list-like pages).

    Output: (id, n_lines, end_punct_frac, short_line_frac,
    dup_line_char_frac, new_line_ratio, keep), fractions rounded 6dp
    (engine-exact). Documents with no nonempty lines fail the
    punctuation rule (frac 0) and keep=false. Pure per-row array
    arithmetic — zero shuffles, zero joins, zero UDFs (the
    gopher_line_cols cost class).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines_all = F.split(t, "\n", -1)
    s1 = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.transform(lines_all, lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        ).alias("_ln"),
        (F.size(lines_all) - 1).cast("long").alias("_n_nl"),
        F.size(tokens(t)).cast("long").alias("_n_words"),
    )
    n_lines = F.size("_ln")
    end_punct = F.size(
        F.filter(
            F.col("_ln"),
            lambda l: F.substring(l, F.length(l), 1).isin(
                list(FINEWEB_STOP_CHARS)
            ),
        )
    )
    short = F.size(
        F.filter(F.col("_ln"), _short_line_pred(short_line_length))
    )
    _, dup_char = _dup_fracs(F.col("_ln"))
    frac = lambda c: F.when(  # noqa: E731
        n_lines > 0, F.round(c / n_lines, 6)
    ).otherwise(F.lit(0.0))
    nl_ratio = F.when(
        F.col("_n_words") > 0, F.round(F.col("_n_nl") / F.col("_n_words"), 6)
    ).otherwise(F.lit(0.0))
    s2 = s1.select(
        "_id",
        n_lines.cast("long").alias("n_lines"),
        frac(end_punct).alias("end_punct_frac"),
        frac(short).alias("short_line_frac"),
        dup_char.alias("dup_line_char_frac"),
        nl_ratio.alias("new_line_ratio"),
    )
    keep = (
        (F.col("end_punct_frac") > line_punct_thr)
        & (F.col("short_line_frac") < short_line_thr)
        & (F.col("dup_line_char_frac") < char_dup_thr)
        & (F.col("new_line_ratio") < new_line_thr)
    )
    return s2.select(
        F.col("_id").alias(id_col),
        "n_lines",
        "end_punct_frac",
        "short_line_frac",
        "dup_line_char_frac",
        "new_line_ratio",
        keep.alias("keep"),
    )


def _short_line_pred(short_line_length: int):
    """Closure factory (the F.filter lambda-arity rule)."""
    return lambda l: F.length(l) <= short_line_length


# ---------------------------------------------------------------------------
# Paragraph-granularity curation (CCNet's actual filtering shape)
# ---------------------------------------------------------------------------
# Wenzek et al. 2020 score and filter PER PARAGRAPH — langid plus LM
# perplexity against a frozen target-domain model — keeping the clean
# paragraphs of mixed documents instead of killing or keeping whole
# docs (§4.3's head/middle/tail operates on paragraph-level scores).
# Document-level gates (v5/v6's with_lang + gopher stack) cannot
# express this: an English page with an embedded Russian quote either
# survives with the quote or dies entirely. VERDICT r11 "What's
# missing #1" / "Next #1".


def paragraph_signals(
    df: DataFrame,
    lm_path: str | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    max_chars: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """Per-paragraph curation signals: split each document on ``sep``
    and label every paragraph with its COMPUTED language
    (:func:`~magicxml_spark.operators.langid.with_lang` semantics,
    including the ``min_score`` confidence gate) and its LM surprisal
    against the FROZEN snapshot at ``lm_path``
    (:func:`score_with_lm_snapshot`'s ladder — CCNet scores crawl
    paragraphs against a Wikipedia-domain model, never the corpus's
    own statistics). ``lm_path=None`` skips the LM arm entirely
    (langid-only paragraph curation — the v8 composition's stage 0):
    ``n_tokens``/``surprisal`` come back NULL and the plan contains
    no scoring join. Output: one row per paragraph —
    ``(id, pos, para, lang, lang_score, n_tokens, surprisal)`` where
    ``surprisal`` is NULL for token-free paragraphs (they score
    nothing; their ``lang`` is 'und' already).

    Scale shape: ONE posexplode (the exploded paragraph frame
    localCheckpoints — it feeds the langid projection chain and the
    LM scoring join, and Catalyst would re-run the split per
    consumer); langid is the pure-Column zero-shuffle append; LM
    scoring is the frozen-snapshot join chain (hint-free — AQE
    broadcasts count tables while they measure small); one (id, pos)
    equi-join stitches the two signal frames. The paragraph key is a
    ``struct(id, pos)`` — typed, never a string concat."""
    import re

    from magicxml_spark.operators.langid import with_lang

    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")), re.escape(sep), -1
            )
        ).alias("_pos", "_para"),
    )
    if lm_path is not None:
        # two consumers (langid chain + LM scoring): materialize the
        # exploded frame once; langid-only plans have one consumer and
        # stay lazy
        paras = paras.localCheckpoint(eager=True)
    lid = with_lang(
        paras, "_para", out_col="_plang", max_chars=max_chars,
        min_score=min_score,
    ).select(
        "_id",
        "_pos",
        "_para",
        F.col("_plang").alias("_lang"),
        F.col("_plang_score").alias("_lang_score"),
    )
    if lm_path is None:
        return lid.select(
            F.col("_id").alias(id_col),
            F.col("_pos").alias("pos"),
            F.col("_para").alias("para"),
            F.col("_lang").alias("lang"),
            F.col("_lang_score").alias("lang_score"),
            F.lit(None).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("surprisal"),
        )
    scored = score_with_lm_snapshot(
        paras.select(
            F.struct("_id", "_pos").alias("_pid"),
            F.col("_para").alias("_ptext"),
        ),
        lm_path,
        id_col="_pid",
        text_col="_ptext",
    ).select(
        F.col("_pid._id").alias("_id"),
        F.col("_pid._pos").alias("_pos"),
        "n_tokens",
        "surprisal",
    )
    return lid.join(scored, ["_id", "_pos"], "left").select(
        F.col("_id").alias(id_col),
        F.col("_pos").alias("pos"),
        F.col("_para").alias("para"),
        F.col("_lang").alias("lang"),
        F.col("_lang_score").alias("lang_score"),
        "n_tokens",
        "surprisal",
    )


def paragraph_curation(
    df: DataFrame,
    lm_path: str | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    keep_lang: str = "en",
    max_surprisal: float | None = None,
    max_chars: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """Paragraph-granularity curation: drop foreign and high-surprisal
    paragraphs, keep the rest, and reassemble documents — the CCNet
    per-paragraph filter (Wenzek et al. 2020 §4.3) the document-level
    v5/v6 gates cannot express. A paragraph survives iff its computed
    language equals ``keep_lang`` AND (when ``max_surprisal`` is set)
    its frozen-LM surprisal is non-NULL and at most ``max_surprisal``
    — both signals from :func:`paragraph_signals`, so the decision
    frame is oracle-expressible end to end.

    Output: one row per input document —
    ``(id, n_paras, n_kept, text_kept)`` with ``text_kept`` the
    surviving paragraphs re-joined with ``sep`` in original order
    (empty string when every paragraph was dropped) — the
    :func:`paragraph_dedup` rebuild shape, so downstream doc-level
    stages (Gopher, FineWeb, dedup, packing) compose unchanged.

    Scale shape: :func:`paragraph_signals`' cost (one posexplode, one
    zero-shuffle langid append, the snapshot scoring joins, one
    (id, pos) join) plus ONE groupBy on the doc id for the rebuild;
    keep/drop rides as a marker column through the aggregate, so
    there is no kept-vs-totals join and no filter ever touches the
    computed-column projections (the gate-shape contract holds by
    construction — the decision is a projection marker, not a pushed
    predicate)."""
    if max_surprisal is not None and lm_path is None:
        raise ValueError(
            "max_surprisal requires a frozen LM snapshot (lm_path is "
            "None — the langid-only mode has no surprisal signal)"
        )
    sig = paragraph_signals(
        df, lm_path, id_col, text_col, sep,
        max_chars=max_chars, min_score=min_score,
    )
    keep = F.col("lang") == keep_lang
    if max_surprisal is not None:
        keep = keep & F.coalesce(
            F.col("surprisal") <= max_surprisal, F.lit(False)
        )
    marked = sig.withColumn("_keep", keep)
    return rebuild_documents(marked, id_col, "pos", "para", "_keep", sep)


def rebuild_documents(
    marked: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    para_col: str = "para",
    keep_col: str = "keep",
    sep: str = "\n\n",
) -> DataFrame:
    """Reassemble documents from a marked paragraph frame — the shared
    rebuild tail of every paragraph-granularity pass (langid/LM
    curation, the classifier arm, the dedup family's shape): ONE
    groupBy on the doc id computing totals, kept counts, and the
    re-joined text in the same aggregation (keep/drop rides as a
    marker column — no kept-vs-totals join, no filter over upstream
    computed columns). Output: ``(id, n_paras, n_kept, text_kept)``
    with ``text_kept`` the surviving paragraphs in original
    ``pos_col`` order (empty string when every paragraph dropped)."""
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col(keep_col).cast("long")).alias("n_kept"),
            # kept-filter inside the partial aggregate (collect_list
            # skips nulls): dropped paragraphs' text never crosses the
            # rebuild exchange — at CCNet drop rates that halves the
            # reassembly shuffle (guide §2.3). Value-identical:
            # pos_col is unique per document, so sorting the kept
            # (pos, text) structs reproduces the old
            # filter-after-sort order, and NULL/false keep dropped the
            # row in both spellings.
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col(keep_col),
                                F.struct(
                                    F.col(pos_col).alias("_p"),
                                    F.col(para_col).alias("_t"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                ),
                sep,
            ).alias("text_kept"),
        )
        .select(id_col, "n_paras", "n_kept", "text_kept")
    )
