"""Seeded fuzz: scalar functions vs Python reimplementations of the
reference, over one batched DataFrame pass (hundreds of random inputs,
single Spark job)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from magicxml_spark.functions.strings import dedup_delimited, sanitize_name
from tests.test_strings import reference_dedup, reference_sanitize

_ALPHABETS = [
    "abc XYZ 123",
    "абвгд ЕЖЗ",
    "()[]«»  ///?!.,",
    "™®©§  \t\n",
    "名字 한글 ß",
    "'\"`~@#$%^&*+=<>|№°\\/-",
]


def _random_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        chars = []
        for _ in range(rng.randrange(0, 40)):
            chars.append(rng.choice(rng.choice(_ALPHABETS)))
        out.append("".join(chars))
    return out


def test_sanitize_fuzz(spark):
    values = _random_strings(300, seed=1)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(sanitize_name(F.col("v"))).collect()]
    want = [reference_sanitize(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:3]


def test_dedup_fuzz(spark):
    rng = random.Random(2)
    base = _random_strings(100, seed=3)
    values = [
        "///".join(rng.choice(base) for _ in range(rng.randrange(0, 8)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(dedup_delimited(F.col("v"))).collect()]
    want = [reference_dedup(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:3]


def test_digit_like_tag_rule_fuzz():
    # pure-Python agreement between the regex used in Spark plans and
    # the reference's replace('.','',1).isdigit()
    rng = random.Random(4)
    pat = re.compile(r"[0-9]+\.?[0-9]*|\.[0-9]+")
    for _ in range(2000):
        s = "".join(rng.choice("0123456789..ab") for _ in range(rng.randrange(0, 6)))
        ref = s.replace(".", "", 1).isdigit()
        assert bool(pat.fullmatch(s)) == ref, s
