"""A5: dependency parsing (reference `assets/SpaCy Dependency
Visualization/main.py:44-47`).

The reference feeds one form-submitted text through
`spacy.load("en_core_web_sm")` and renders displacy HTML. The engine
equivalent is the data that drawing consumes: one row per token with
its part-of-speech, dependency label, and head index — over a whole
document corpus instead of one textarea.

spaCy is not in this image, so the parse is import-gated exactly like
the S9-S11 codecs (`sources/binary_docs.py`): with spacy present the
real `en_core_web_sm` pipeline runs once per executor inside
``mapInPandas`` (model load amortized over Arrow batches — the right
shape at 100 TB, where per-row model loads would dominate); without
it, ``deterministic_stub=True`` yields a deterministic fake parse so
the distributed plumbing (schema, fan-out, lineage) is exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEPENDENCY_SCHEMA = (
    "doc_id bigint, token_index int, token string, pos string, dep string, "
    "head_index int"
)

_STUB_POS = ["NOUN", "VERB", "ADJ", "ADP", "DET", "PRON", "ADV", "PROPN"]
_STUB_DEP = ["nsubj", "obj", "amod", "prep", "det", "ROOT", "advmod", "pobj"]


def _have_spacy() -> bool:
    try:
        import spacy  # noqa: F401

        return True
    except ImportError:
        return False


def dependency_parse(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    deterministic_stub: bool = False,
) -> DataFrame:
    """Token-level dependency table: (doc_id, token_index, token, pos,
    dep, head_index), one row per token per document.

    Stub semantics (deterministic, engine-testable): whitespace
    tokenization; token 0 is the ROOT with head_index 0 (spaCy's root
    convention points a root at itself); every later token attaches to
    the previous one; pos/dep are md5-derived picks from fixed label
    sets so values are stable across runs and engines.

    Without spaCy and without the stub flag, the call falls back to
    the RULE-BASED declarative parse (analytics/heuristic_parse.py —
    lexicon/suffix POS tagging + deterministic head attachment, pure
    window expressions, oracle-checked) instead of raising — the same
    degrade-to-real-heuristic contract as P17's html.parser arm. The
    spaCy probe runs driver-side; clusters with spaCy on executors
    only should set an explicit env marker and call the mapInPandas
    path directly.
    """
    if not deterministic_stub and not _have_spacy():
        from magicxml_spark.analytics.heuristic_parse import (
            heuristic_dependency_parse,
        )

        return heuristic_dependency_parse(df, id_col, text_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = _have_spacy()
        nlp = None
        if use_real:  # pragma: no cover - spacy not in image
            import spacy

            try:
                nlp = spacy.load("en_core_web_sm")
            except OSError:
                from spacy.cli.download import download

                download("en_core_web_sm")
                nlp = spacy.load("en_core_web_sm")
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if use_real:  # pragma: no cover
                    doc = nlp(text)
                    for tok in doc:
                        rows.append(
                            (doc_id, tok.i, tok.text, tok.pos_, tok.dep_, tok.head.i)
                        )
                elif deterministic_stub:
                    for i, tok in enumerate(text.split()):
                        digest = hashlib.md5(tok.encode()).digest()
                        rows.append(
                            (
                                doc_id,
                                i,
                                tok,
                                _STUB_POS[digest[0] % len(_STUB_POS)],
                                "ROOT" if i == 0 else _STUB_DEP[digest[1] % len(_STUB_DEP)],
                                max(0, i - 1),
                            )
                        )
                else:
                    raise NotImplementedError(
                        "spacy not installed; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "token_index", "token", "pos", "dep", "head_index"],
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=DEPENDENCY_SCHEMA)
