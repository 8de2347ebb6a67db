"""Approximate large-scale testdata generator — PROFILING ONLY.

The driver's own sf1.0 dataset (seed=42, TESTDATA.md) is not present in this
sandbox; this script synthesizes a statistically similar dataset at an
arbitrary multiple of sf0.1 so large-scale plan behavior (candidate growth,
skew, shuffle volume) can be measured. It is fitted to the OBSERVED sf0.1
marginals:

- documents: iid words over the 31-token vocabulary (30 near-uniform at
  p≈0.033 each + 'dup' at p≈0.0009), doc length Uniform{10..100} words,
  lang {en:41%, zh/es/fr/de:~15% each}, source uniform over src0..src19.
- embeddings: 64-d unit vectors with a weak label-cluster pull matching the
  observed within-label cosine (~0.07), labels uniform 0..9.
- customer/supplier/part/orders/lineitem/events: column marginals resampled
  from sf0.1 with key ranges rescaled to the target size.

Each table is written as ONE parquet file with ONE row group, matching the
driver data's layout (the single-split scan behavior is part of what the
operators' conditional spreads react to).

NEVER used by bench.py, oracles, or tests — measurement apparatus only.

Usage: python scripts/gen_sfbig.py /root/sfbig [scale_mult=10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "row", "the", "agg",
    "key", "query", "a", "scan", "batch",
]
P_DUP = 0.0009


def write_one(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=1 << 31, compression="snappy")


def gen_documents(out: str, n: int, rng: np.random.Generator) -> None:
    p = np.full(len(VOCAB), (1.0 - P_DUP) / len(VOCAB))
    words = np.array(VOCAB + ["dup"])
    probs = np.concatenate([p, [P_DUP]])
    lens = rng.integers(10, 101, size=n)
    total = int(lens.sum())
    draw = rng.choice(len(words), size=total, p=probs)
    texts = []
    off = 0
    for L in lens:
        texts.append(" ".join(words[draw[off : off + L]]))
        off += L
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    sources = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    write_one(
        f"{out}/documents.parquet",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(langs.tolist()),
                "source": pa.array(sources.tolist()),
                "n_chars": pa.array(n_chars),
            }
        ),
    )


def gen_embeddings(out: str, n: int, rng: np.random.Generator) -> None:
    dim = 64
    labels = rng.integers(0, 10, size=n)
    cents = rng.standard_normal((10, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # weak pull: observed within-label cosine at sf0.1 is ~0.07; with
    # |noise| ≈ sqrt(dim) = 8, cos ≈ a/8 → a ≈ 0.56
    v = rng.standard_normal((n, dim)) + 0.56 * cents[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write_one(
        f"{out}/embeddings.parquet",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(v.astype(np.float64))),
                "label": pa.array(labels.astype(np.int64)),
            }
        ),
    )


def resample(col: np.ndarray, n: int, rng: np.random.Generator) -> np.ndarray:
    return col[rng.integers(0, len(col), size=n)]


def main() -> None:
    out = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260822)

    # fixed tiny dims: copy verbatim
    for t in ["region", "nation"]:
        write_one(f"{out}/{t}.parquet", pq.read_table(f"{SRC}/{t}.parquet"))

    n_docs = 5000 * mult
    gen_documents(out, n_docs, rng)
    gen_embeddings(out, 2000 * mult, rng)

    n_cust, n_supp, n_part = 15000 * mult, 1000 * mult, 20000 * mult
    n_orders, n_li, n_events = 150000 * mult, 600000 * mult, 100000 * mult

    cust = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    write_one(
        f"{out}/customer.parquet",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(resample(cust.c_nationkey.values, n_cust, rng)),
                "c_acctbal": pa.array(resample(cust.c_acctbal.values, n_cust, rng)),
                "c_mktsegment": pa.array(resample(cust.c_mktsegment.values, n_cust, rng).tolist()),
            }
        ),
    )
    supp = pq.read_table(f"{SRC}/supplier.parquet").to_pandas()
    write_one(
        f"{out}/supplier.parquet",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(resample(supp.s_nationkey.values, n_supp, rng)),
                "s_acctbal": pa.array(resample(supp.s_acctbal.values, n_supp, rng)),
            }
        ),
    )
    part = pq.read_table(f"{SRC}/part.parquet").to_pandas()
    write_one(
        f"{out}/part.parquet",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array(resample(part.p_name.values, n_part, rng).tolist()),
                "p_brand": pa.array(resample(part.p_brand.values, n_part, rng).tolist()),
                "p_type": pa.array(resample(part.p_type.values, n_part, rng).tolist()),
                "p_size": pa.array(resample(part.p_size.values, n_part, rng)),
                "p_retailprice": pa.array(resample(part.p_retailprice.values, n_part, rng)),
            }
        ),
    )
    orders = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    write_one(
        f"{out}/orders.parquet",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
                "o_custkey": pa.array(rng.integers(0, n_cust, size=n_orders)),
                "o_orderstatus": pa.array(resample(orders.o_orderstatus.values, n_orders, rng).tolist()),
                "o_totalprice": pa.array(resample(orders.o_totalprice.values, n_orders, rng)),
                "o_orderdate": pa.array(resample(orders.o_orderdate.values, n_orders, rng).tolist()),
                "o_orderpriority": pa.array(resample(orders.o_orderpriority.values, n_orders, rng).tolist()),
            }
        ),
    )
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    write_one(
        f"{out}/lineitem.parquet",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_orders, size=n_li)),
                "l_partkey": pa.array(rng.integers(0, n_part, size=n_li)),
                "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li)),
                "l_linenumber": pa.array(resample(li.l_linenumber.values, n_li, rng)),
                "l_quantity": pa.array(resample(li.l_quantity.values, n_li, rng)),
                "l_extendedprice": pa.array(resample(li.l_extendedprice.values, n_li, rng)),
                "l_discount": pa.array(resample(li.l_discount.values, n_li, rng)),
                "l_tax": pa.array(resample(li.l_tax.values, n_li, rng)),
                "l_returnflag": pa.array(resample(li.l_returnflag.values, n_li, rng).tolist()),
                "l_linestatus": pa.array(resample(li.l_linestatus.values, n_li, rng).tolist()),
                "l_shipdate": pa.array(resample(li.l_shipdate.values, n_li, rng).tolist()),
            }
        ),
    )
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, size=n_events)).astype("timedelta64[us]")
    write_one(
        f"{out}/events.parquet",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, 1500 * mult, size=n_events)),
                "event_type": pa.array(resample(ev.event_type.values, n_events, rng).tolist()),
                "value": pa.array(resample(ev.value.values, n_events, rng)),
                "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n_events)]),
            }
        ),
    )
    with open(f"{out}/_DONE", "w") as f:
        f.write("profiling-only approximate data; see scripts/gen_sfbig.py\n")
    print(f"wrote {out} at {mult}x sf0.1")


if __name__ == "__main__":
    main()
