#!/usr/bin/env python
"""Deterministic scale-factor data generator for bench runs above sf0.1.

The driver ships read-only testdata at sf{0.001,0.01,0.1} (TESTDATA.md);
proving fixed-cost amortization needs at least sf1, so this script
synthesizes the same ten tables at an arbitrary scale factor with the
schemas and value distributions measured from the driver's sf0.1 data
(row counts scale linearly; region/nation are fixed dims; embeddings
floor at 500 rows like the driver's sf0.01 output).

Usage: python tools/gen_sf.py SF OUT_DIR   (e.g. 1 .scratch/sf1)

The generated data is a bench fixture only — correctness gates keep
using the driver's own testdata. Both engines (Spark + DuckDB oracle)
read the SAME generated parquet, so relative timings are apples-to-
apples regardless of small distributional differences from the
driver's generator.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
P_ADJ = ["large", "hot", "blue", "old", "red", "green", "shiny", "small"]
P_NOUN = ["ring", "bolt", "plate", "wheel", "gear", "pipe", "rod", "cap"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
# 31-word vocabulary mirroring the driver's synthetic document corpus
VOCAB = (
    "spark query table line column order sort scan hash group join "
    "filter agg stream batch merge value key window vector part "
    "customer big small fast slow the a data index cache"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _days(rng: np.random.Generator, n: int, start: str, end: str) -> np.ndarray:
    s = np.datetime64(start, "D").astype("datetime64[us]").astype(np.int64)
    e = np.datetime64(end, "D").astype("datetime64[us]").astype(np.int64)
    day_us = 86_400_000_000
    return (
        s + rng.integers(0, (e - s) // day_us + 1, n) * day_us
    ).astype("datetime64[us]")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", file=sys.stderr)


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _days(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: ~4.08 lines/order (measured), clipped to 1..17
    counts = np.clip(1 + rng.poisson(3.075, n_ord), 1, 17)
    n_li = int(counts.sum())
    l_orderkey = np.repeat(np.arange(n_ord), counts)
    l_linenumber = np.concatenate([np.arange(1, c + 1) for c in counts]) \
        if n_ord < 2_000_000 else (
        # vectorized within-order 1..c (per-order cumcount) for big SFs
        np.arange(n_li) - np.repeat(np.cumsum(counts) - counts, counts) + 1
    )
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _days(rng, n_li, "1995-01-01", "2001-09-01"),
    }))

    ts0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86_400_000_000
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": (ts0 + rng.integers(0, span, n_ev)).astype("datetime64[us]"),
        "user_id": pa.array(rng.integers(0, max(1, n_cust // 10), n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(np.minimum(rng.exponential(60, n_ev), 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: random words from the 31-word vocab; ~1% near-dups
    # (copy of an earlier doc with one word appended) + ~0.2% exact dups,
    # matching the dup density measured in the driver's sf0.1 corpus.
    vocab = np.array(VOCAB)
    wc = rng.integers(8, 104, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.012:
            texts.append(texts[rng.integers(0, i)] + " " + vocab[rng.integers(31)])
        else:
            texts.append(" ".join(vocab[rng.integers(0, 31, wc[i])]))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)
        ],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 unit-norm cluster centers + gaussian noise, renormalized
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f".scratch/sf{sf:g}"
    generate(sf, out)
