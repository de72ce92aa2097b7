"""Heavy-operator scaling curves (round-8 item: time-vs-n evidence).

Generates synthetic documents/embeddings with the SAME generator shape
as /root/testdata (word salad over the 31-word vocab, ~54 tokens/doc,
5 langs; 64-dim float32 embeddings with cluster structure) at 1x/10x/50x
the sf0.1 row counts, then times each heavy operator end-to-end at each
scale. Near-linear growth is the pass criterion; any superlinear bend
must be explained by the operator's documented scale shape (e.g.
exact_jaccard_join's candidate volume is sum(df^2) over prefix
occurrences — a 31-word vocab caps the shingle space at 31^3, so df
grows linearly with n and candidates quadratically; real corpora have
open vocabularies where df stays flat).

Usage: PYTHONPATH=/root/repo python scripts/scale_stress.py [scales]
  scales: comma list of multipliers, default 1,10,50
Writes data under /tmp/scale_r8/ (regenerated if absent) and prints a
markdown-ish table to stdout.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOCS_BASE, EMB_BASE = 5_000, 2_000  # sf0.1 row counts
VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "plan", "shuffle", "cache", "limit",
]
LANGS = ["en", "en", "de", "zh", "fr", "es"]  # en twice ~ real skew


def gen_documents(n: int, out: Path, seed: int = 42) -> None:
    rng = np.random.RandomState(seed)
    lens = rng.randint(30, 80, size=n)
    texts = []
    for i in range(n):
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), size=lens[i])]
        texts.append(" ".join(words))
    # ~3% near-duplicate structure (perturbed copies of earlier docs),
    # mirroring the handful of exact dups in the driver's table but
    # keeping dup density CONSTANT in n so output size stays linear
    n_dup = n * 3 // 100
    for i in rng.choice(np.arange(n // 2, n), size=n_dup, replace=False):
        src = int(rng.randint(0, n // 2))
        toks = texts[src].split()
        toks[int(rng.randint(0, len(toks)))] = VOCAB[int(rng.randint(0, len(VOCAB)))]
        texts[int(i)] = " ".join(toks)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[int(x)] for x in rng.randint(0, len(LANGS), n)]),
        "source": pa.array([f"src{int(x)}" for x in rng.randint(0, 4, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, out)


def gen_embeddings(n: int, out: Path, seed: int = 7) -> None:
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, size=(8, 64))
    labels = rng.randint(0, 8, size=n)
    vecs = (centers[labels] + rng.normal(0, 0.3, size=(n, 64))).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, out)


def main() -> None:
    scales = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "1,10,50").split(",")]
    root = Path("/tmp/scale_r8")
    root.mkdir(exist_ok=True)
    for mult in scales:
        d = root / f"x{mult}"
        d.mkdir(exist_ok=True)
        if not (d / "documents.parquet").exists():
            gen_documents(DOCS_BASE * mult, d / "documents.parquet", seed=42 + mult)
        if not (d / "embeddings.parquet").exists():
            gen_embeddings(EMB_BASE * mult, d / "embeddings.parquet", seed=7 + mult)

    from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        duplicated_span_dedup,
        exact_jaccard_join,
        minhash_dedup,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import kmeans_fit
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ranking import bm25_topk
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import lsq_sketch
    from pyspark.sql import functions as F

    spark = get_spark(
        "scale_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1).count()  # session warm

    def t_minhash(docs, emb):
        return minhash_dedup(docs, threshold=0.8).count()

    def t_span(docs, emb):
        # count() would prune the clean_text reconstruction — force the
        # full span-strip pipeline through an agg over its output
        r = duplicated_span_dedup(docs).agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("clean_text")).alias("w")
        ).collect()[0]
        return r["n"]

    def t_jaccard(docs, emb):
        return exact_jaccard_join(docs, threshold=0.9).count()

    def t_bm25(docs, emb):
        return bm25_topk(docs, ["spark", "shuffle", "window"]).count()

    def t_lsq(docs, emb):
        return lsq_sketch(
            docs.select("doc_id", F.col("n_chars").alias("v")), "v", "doc_id"
        ).count()

    def t_bpe(docs, emb):
        # learn 4 merges on the corpus, then encode the whole corpus:
        # the Heaps-law claim under test is that the merge rounds and
        # the replay run on the distinct-word relation, so total cost
        # tracks the two corpus passes (word count + join-back)
        from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import bpe_encode, bpe_learn_merges

        rules = bpe_learn_merges(docs, n_merges=4)
        return bpe_encode(docs, rules).count()

    def t_ivfpq(docs, emb):
        cents = kmeans_fit(emb, k=4, n_iter=2)
        enc, cbs = ivfpq_encode(emb, cents, m=2, k_sub=4, n_iter=2, dim=64)
        return ivfpq_topk(
            enc, emb.filter("vec_id < 10"), cents, cbs, k=5, n_probe=2, dim=64
        ).count()

    ops = [
        ("minhash_dedup_cc", t_minhash, None),
        ("duplicated_span_dedup", t_span, None),
        # closed 31-word vocab => shingle space capped at 31^3, df grows
        # ~linearly in n, candidate volume sum(df^2) quadratically — the
        # documented PPJoin scale shape makes x50 pointless to wait out
        ("exact_jaccard_join@0.9", t_jaccard, 10),
        ("bm25_topk", t_bm25, None),
        ("lsq_sketch", t_lsq, None),
        ("ann_topk_ivfpq", t_ivfpq, None),
        ("bpe_learn+encode", t_bpe, None),
    ]
    print(f"{'operator':26s} " + " ".join(f"{'x' + str(m):>18s}" for m in scales))
    results: dict[str, list[tuple[int, float, int]]] = {}
    for name, fn, cap in ops:
        row = []
        for mult in scales:
            if cap is not None and mult > cap:
                continue
            d = root / f"x{mult}"
            docs = spark.read.parquet(str(d / "documents.parquet"))
            emb = spark.read.parquet(str(d / "embeddings.parquet"))
            t0 = time.time()
            n_out = fn(docs, emb)
            el = time.time() - t0
            row.append((mult, el, n_out))
        results[name] = row
        print(f"{name:26s} " + " ".join(f"{el:8.2f}s n={n:<8d}" for _, el, n in row))
    # growth factors vs scale factors
    print("\n# time growth vs data growth (ideal linear: ratio ~= scale ratio)")
    for name, row in results.items():
        for (m0, t0, _), (m1, t1, _) in zip(row, row[1:]):
            print(f"{name:26s} x{m0}->x{m1}: data x{m1 / m0:.0f}, time x{t1 / t0:.1f}")


if __name__ == "__main__":
    main()
