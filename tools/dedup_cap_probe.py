#!/usr/bin/env python
"""sf10-scale spot-check of the dedup mega-bucket caps (VERDICT r3 #8).

Generates a documents corpus at an arbitrary row count with EXACTLY the
gen_sf.py recipe (same vocab, dup densities, seed), then runs the two
bucketed pair emitters with and without ``max_bucket_size``, recording
candidate-pair counts and wall time. At sf10-equivalent volume
(500k docs) the hot buckets are real: the 31-word vocabulary means the
globally-minimal md5 shingle lands in a constant FRACTION of documents
(minhash), and 2048 slice buckets hold ~250 docs each on average with
heavy skew (wide simhash) — precisely the regime where the uncapped
join is quadratic per bucket and the cap's O(b) star emission must
hold the budget.

Usage:  python tools/dedup_cap_probe.py [N_DOCS] [CAP] [RUNS]
        (defaults 500_000 docs, cap 64, RUNS=mu,mc,su,sc — comma list:
        m=minhash/s=simhash, u=uncapped/c=capped. At 500k docs the
        uncapped simhash run is quadratic-per-bucket and projects to
        HOURS from the measured 50k point — select sc/mc/mu explicitly
        to skip it.)

Prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_sf import SEED, VOCAB  # same corpus recipe, same seed


def gen_documents(n_doc: int, out_path: str) -> None:
    rng = np.random.default_rng(SEED)
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
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n_doc), pa.int64()), "text": texts}),
        out_path,
    )


def main() -> None:
    n_doc = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    runs = set((sys.argv[3] if len(sys.argv) > 3 else "mu,mc,su,sc").split(","))

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"dedup_probe_{n_doc}",
    )
    os.makedirs(scratch, exist_ok=True)
    docs_path = os.path.join(scratch, "documents.parquet")
    if not os.path.exists(docs_path):
        print(f"generating {n_doc} docs ...", file=sys.stderr)
        gen_documents(n_doc, docs_path)

    from magicxml_spark.operators.dedup import (
        lsh_candidate_pairs,
        simhash_wide_near_dup_pairs,
    )
    from magicxml_spark.session import get_spark

    spark = get_spark("dedup-cap-probe")
    docs = spark.read.parquet(docs_path)

    def run(label, fn):
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        print(f"| {label} | {n:,} | {dt:.1f} |")
        return n, dt

    print(f"\nn_docs={n_doc:,} cap={cap} (local[32])\n")
    print("| run | pairs | wall (s) |")
    print("|---|---|---|")
    if "mu" in runs:
        run(
            "minhash_lsh uncapped",
            lambda: lsh_candidate_pairs(docs, "doc_id", "text", max_bucket_size=None),
        )
    if "mc" in runs:
        run(
            f"minhash_lsh cap={cap}",
            lambda: lsh_candidate_pairs(docs, "doc_id", "text", max_bucket_size=cap),
        )
    if "su" in runs:
        run(
            "simhash_wide uncapped",
            lambda: simhash_wide_near_dup_pairs(docs, "doc_id", "text", max_bucket_size=None),
        )
    if "sc" in runs:
        run(
            f"simhash_wide cap={cap}",
            lambda: simhash_wide_near_dup_pairs(
                docs, "doc_id", "text", max_bucket_size=cap
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
