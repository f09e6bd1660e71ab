#!/usr/bin/env python3
"""Seeded 10x-of-sf0.1 corpus generator for scale probes (SURVEY §8.3).

Regenerates the `target/scale10` tables the 10x growth-ratio probes run
against (they are gitignored build artifacts; this script is the
reproducible source). Matches the regime of the driver's sf0.1 tables,
scaled the way a real corpus grows:

  documents  50,000 rows (10x), vocabulary ~2.15x (30 -> 65 common
             tokens + the rare 'dup' token) so the 3-gram shingle-df
             distribution stays in the same regime as sf0.1 — a fixed
             vocabulary at 10x rows would push most shingles past the
             posting-list cap and short-circuit candidate generation,
             which real corpus growth does not. Doc lengths 10..100
             tokens, 40/15/15/15/15 lang split, 20 uniform sources,
             ~0.3% exact duplicates.
  embeddings 20,000 rows (10x), dim 64, 10 labels with per-(label,dim)
             mean offsets + N(0, 0.12) noise — mirrors sf0.1's
             label-cluster structure.
  events     1,000,000 rows (10x), 15,000 users (10x — users scale OUT
             so per-user session counts stay flat), 30 days, 5 uniform
             event types, Exp(50) values, {"k": int} props. Written as
             TIMESTAMP(NANOS) like the driver's table (graft.sources
             .Tables reads events via the nanosAsLong path; a µs-typed
             copy would silently take a different code path).

Usage: python3 tools/scale10.py [outDir=target/scale10]
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42


def documents(out):
    rng = np.random.default_rng(SEED)
    base = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
            "part", "hash", "merge", "batch", "spark", "a", "the", "line",
            "sort", "window", "order", "data", "column", "join", "small",
            "customer", "query", "big", "stream", "group", "vector",
            "filter"]
    extra = [f"tok{i}" for i in range(35)]  # 30 -> 65 common (~2.15x)
    vocab = np.array(base + extra)
    n = 50000
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang = langs[rng.choice(5, size=n, p=[0.4, 0.15, 0.15, 0.15, 0.15])]
    source = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    lens = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=lens[i])].tolist()
        if rng.random() < 0.005:  # the rare token, sf0.1's 'dup' analogue
            words[int(rng.integers(0, len(words)))] = "dup"
        texts.append(" ".join(words))
    # ~0.3% exact duplicates: later docs copying an earlier doc's text
    for _ in range(150):
        j = int(rng.integers(1, n))
        texts[j] = texts[int(rng.integers(0, j))]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(tbl, f"{out}/documents.parquet", row_group_size=8192)


def embeddings(out):
    rng = np.random.default_rng(SEED + 1)
    m, dim, k = 20000, 64, 10
    label = rng.integers(0, k, size=m).astype(np.int32)
    means = rng.normal(0.0, 0.02, size=(k, dim))
    vecs = (means[label] + rng.normal(0.0, 0.12, size=(m, dim))) \
        .astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(m, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(label),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=8192)


def events(out):
    rng = np.random.default_rng(SEED + 2)
    n, users = 1000000, 15000
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = 30 * 24 * 3600
    ts = t0 + (rng.integers(0, span, size=n, dtype=np.int64) * 10**9
               + rng.integers(0, 10**6, size=n, dtype=np.int64) * 10**3)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(ts)).cast(pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, users, size=n,
                                         dtype=np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, size=n)],
                               pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([json.dumps({"k": int(v)})
                           for v in rng.integers(0, 100, size=n)],
                          pa.string()),
    })
    pq.write_table(tbl, f"{out}/events.parquet", row_group_size=131072)


def lineitem(out, src="/root/testdata/sf0.1/lineitem.parquet"):
    """10x lineitem for the TPC-H-measure probes (q109): the sf0.1 table
    replicated 10x with offset order/part/supp keys — per-copy value
    distributions are exactly sf0.1's, which is what a scan-bound
    measure-aggregate growth probe needs (10x rows, same regime)."""
    base = pq.read_table(src)
    n = base.num_rows
    copies = []
    for c in range(10):
        t = base
        for key, span in (("l_orderkey", 10_000_000),
                          ("l_partkey", 1_000_000),
                          ("l_suppkey", 100_000)):
            if key in t.column_names:
                idx = t.column_names.index(key)
                col = pa.compute.add(t.column(key), c * span)
                t = t.set_column(idx, key, col)
        copies.append(t)
    pq.write_table(pa.concat_tables(copies), f"{out}/lineitem.parquet", row_group_size=131072)


def orders(out, src="/root/testdata/sf0.1/orders.parquet"):
    """10x orders for the reconciliation probe (q124): replicated 10x with
    offset orderkeys (same span as lineitem's so the key regimes agree);
    custkeys and value columns keep sf0.1's distribution per copy."""
    base = pq.read_table(src)
    copies = []
    for c in range(10):
        idx = base.column_names.index("o_orderkey")
        col = pa.compute.add(base.column("o_orderkey"), c * 10_000_000)
        copies.append(base.set_column(idx, "o_orderkey", col))
    pq.write_table(pa.concat_tables(copies), f"{out}/orders.parquet", row_group_size=131072)


def dims(out, src_dir="/root/testdata/sf0.1"):
    """Remaining star-schema tables so whole-schema probes (q122) run at
    10x: part/supplier replicate 10x with the SAME key offsets lineitem
    uses (referential integrity preserved by construction); customer,
    nation, region copy straight through (orders keeps o_custkey
    unchanged per copy, so the customer key space is unchanged)."""
    for name, key, span in (("part", "p_partkey", 1_000_000),
                            ("supplier", "s_suppkey", 100_000)):
        base = pq.read_table(f"{src_dir}/{name}.parquet")
        idx = base.column_names.index(key)
        copies = [base.set_column(idx, key,
                                  pa.compute.add(base.column(key), c * span))
                  for c in range(10)]
        pq.write_table(pa.concat_tables(copies), f"{out}/{name}.parquet")
    for name in ("customer", "nation", "region"):
        pq.write_table(pq.read_table(f"{src_dir}/{name}.parquet"),
                       f"{out}/{name}.parquet")


def documents100(out):
    """Seeded 100x documents corpus (500k rows) for the second-decade
    dedup probes (VERDICT r6 #8; q35/q36/q37/q63/q65 only — the other
    tables are deliberately not generated, keeping the artifact
    budget-bound). Vocabulary continues the Heaps-style growth the 10x
    table set up (30 common tokens at sf0.1 -> 65 at 10x -> 140 at
    100x, ~V n^0.33) so the 3-gram shingle-df distribution keeps
    tracking real corpus growth instead of saturating the posting-list
    cap; doc lengths, language/source splits, and the ~0.3% exact-dup
    rate match documents()."""
    rng = np.random.default_rng(SEED + 3)
    base = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
            "part", "hash", "merge", "batch", "spark", "a", "the", "line",
            "sort", "window", "order", "data", "column", "join", "small",
            "customer", "query", "big", "stream", "group", "vector",
            "filter"]
    extra = [f"tok{i}" for i in range(110)]  # 30 -> 140 common (~4.7x)
    vocab = np.array(base + extra)
    n = 500000
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang = langs[rng.choice(5, size=n, p=[0.4, 0.15, 0.15, 0.15, 0.15])]
    source = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    lens = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=lens[i])].tolist()
        if rng.random() < 0.005:
            words[int(rng.integers(0, len(words)))] = "dup"
        texts.append(" ".join(words))
    for _ in range(1500):
        j = int(rng.integers(1, n))
        texts[j] = texts[int(rng.integers(0, j))]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(tbl, f"{out}/documents.parquet", row_group_size=8192)


def embeddings100(out):
    """Seeded 100x embeddings (200k rows) for the second-decade Gram/PCA
    probes (q154/q155) — same label-cluster structure as embeddings()."""
    rng = np.random.default_rng(SEED + 4)
    m, dim, k = 200000, 64, 10
    label = rng.integers(0, k, size=m).astype(np.int32)
    means = rng.normal(0.0, 0.02, size=(k, dim))
    vecs = (means[label] + rng.normal(0.0, 0.12, size=(m, dim))) \
        .astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(m, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(label),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=8192)


def events100(out):
    """Seeded 100x events (10M rows, 150k users — users scale OUT like
    events(), so per-user session/feature regimes stay flat) for the
    second-decade temporal probes (q164 KS scan, q165 nearest join).
    Same nanos layout, span, and value law as events()."""
    rng = np.random.default_rng(SEED + 12)
    n, users = 10_000_000, 150_000
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span = 30 * 24 * 3600
    ts = t0 + (rng.integers(0, span, size=n, dtype=np.int64) * 10**9
               + rng.integers(0, 10**6, size=n, dtype=np.int64) * 10**3)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    kv = rng.integers(0, 100, size=n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(ts)).cast(pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, users, size=n,
                                         dtype=np.int64)),
        "event_type": pa.array(types[rng.integers(0, 5, size=n)],
                               pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([json.dumps({"k": int(v)}) for v in kv],
                          pa.string()),
    })
    pq.write_table(tbl, f"{out}/events.parquet", row_group_size=131072)


def lineitem100(out, src="/root/testdata/sf0.1/lineitem.parquet"):
    """Seeded 100x lineitem (60M rows) for the second-decade interval
    probes (q160/q161): lineitem()'s replicate-with-offset scheme at 100
    copies — suppliers scale OUT, so the per-supplier interval density
    (q160's pair regime) stays flat and total pairs grow linearly.
    Written copy-by-copy through one ParquetWriter (a 60M-row concat
    would hold ~5 GB in one table)."""
    base = pq.read_table(src)
    writer = pq.ParquetWriter(f"{out}/lineitem.parquet", base.schema)
    for c in range(100):
        t = base
        for key, span in (("l_orderkey", 10_000_000),
                          ("l_partkey", 1_000_000),
                          ("l_suppkey", 100_000)):
            idx = t.column_names.index(key)
            t = t.set_column(idx, key,
                             pa.compute.add(t.column(key), c * span))
        writer.write_table(t, row_group_size=131072)
    writer.close()


def main(out="target/scale10"):
    if out == "--100x":
        out100 = "target/scale100"
        os.makedirs(out100, exist_ok=True)
        documents100(out100)
        embeddings100(out100)
        events100(out100)
        lineitem100(out100)
        print(f"wrote the 100x documents corpus under {out100}")
        return
    os.makedirs(out, exist_ok=True)
    documents(out)
    embeddings(out)
    events(out)
    lineitem(out)
    orders(out)
    dims(out)
    print(f"wrote the full 10x schema under {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
