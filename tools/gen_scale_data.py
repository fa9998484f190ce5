#!/usr/bin/env python3
"""Deterministic scale-rehearsal data generator (driver-side tooling; the
library itself never runs Python).

Regenerates the sf10 (or any --factor) dataset as a faithful scale-up of
the driver's read-only sf0.1 testdata: same schemas (copied verbatim from
the sf0.1 parquet footers, so physical types — e.g. events.ts
TIMESTAMP(MICROS, isAdjustedToUTC=false) — survive), same value ranges
and categorical sets (measured from sf0.1; see the constants below), row
counts scaled by --factor. Seeded per (table, chunk): re-running always
produces identical files.

Every prior round regenerated this data with an ad-hoc uncommitted
script, which is why no two sessions could reproduce each other's sf10
corpus byte-for-byte. This file ends that: the generator IS the corpus
definition. Usage:

    python3 tools/gen_scale_data.py --out /tmp/graft_scale/sf10 --factor 100

(~2 GB on disk at factor 100: 60M lineitem / 15M orders / 10M events /
500k documents / 200k embeddings.)
"""
import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"

# measured from sf0.1 (see SURVEY round-14 notes)
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["blue", "hot", "small", "cold", "new", "old", "red", "large"]
P_NOUN = ["ring", "rod", "bolt", "anvil", "widget", "gizmo", "plate", "gear"]
OSTATUS = ["O", "P", "F"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["A", "N", "R"]
LSTATUS = ["O", "F"]
ETYPES = ["click", "view", "purchase", "signup", "error"]

EPOCH_1995 = np.datetime64("1995-01-01")  # orders/lineitem date range start
ODATE_DAYS = 2405                          # 1995-01-01 .. 2001-08-01
SHIP_DAYS = 2498                           # 1995-01-02 .. 2001-11-04
EV_T0_US = np.int64(np.datetime64("2024-01-01T00:00:00") .astype("datetime64[us]").astype(np.int64))
EV_SPAN_US = np.int64(30 * 86400) * 1_000_000  # 30 days of January 2024


def schema_of(name):
    return pq.read_schema(f"{SF01}/{name}.parquet")


def write(out, name, batches):
    """Write batches (dict col -> array) as ONE parquet file with the
    sf0.1 schema (casting each chunk), multiple row groups."""
    schema = schema_of(name)
    path = f"{out}/{name}.parquet"
    w = pq.ParquetWriter(path, schema, compression="snappy")
    for cols in batches:
        t = pa.table(cols).cast(schema)
        w.write_table(t)
    w.close()
    print(f"  {name}: {pq.read_metadata(path).num_rows} rows")


def chunked(n, chunk=2_000_000):
    off = 0
    while off < n:
        yield off, min(chunk, n - off)
        off += chunk


def gen(out, factor):
    os.makedirs(out, exist_ok=True)
    f = factor

    # region / nation: fixed dims — copy verbatim
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SF01}/{name}.parquet"),
                       f"{out}/{name}.parquet", compression="snappy")
        print(f"  {name}: copied")

    n_cust = 15_000 * f
    n_supp = 1_000 * f
    n_part = 20_000 * f
    n_ord = 150_000 * f
    n_ev = 100_000 * f
    n_doc = 5_000 * f
    n_vec = 2_000 * f
    n_user = 1_500 * f

    def batches_customer():
        for off, m in chunked(n_cust):
            r = np.random.default_rng((1, off))
            k = np.arange(off, off + m, dtype=np.int64)
            yield {
                "c_custkey": k,
                "c_name": [f"Customer#{i:09d}" for i in k],
                "c_nationkey": r.integers(0, 25, m).astype(np.int32),
                "c_acctbal": np.round(r.uniform(-1000, 10000, m), 2),
                "c_mktsegment": np.array(MKTSEG)[r.integers(0, 5, m)],
            }
    write(out, "customer", batches_customer())

    def batches_supplier():
        for off, m in chunked(n_supp):
            r = np.random.default_rng((2, off))
            k = np.arange(off, off + m, dtype=np.int64)
            yield {
                "s_suppkey": k,
                "s_name": [f"Supplier#{i:09d}" for i in k],
                "s_nationkey": r.integers(0, 25, m).astype(np.int32),
                "s_acctbal": np.round(r.uniform(0, 10000, m), 2),
            }
    write(out, "supplier", batches_supplier())

    def batches_part():
        for off, m in chunked(n_part):
            r = np.random.default_rng((3, off))
            k = np.arange(off, off + m, dtype=np.int64)
            adj = np.array(P_ADJ)[r.integers(0, len(P_ADJ), m)]
            noun = np.array(P_NOUN)[r.integers(0, len(P_NOUN), m)]
            yield {
                "p_partkey": k,
                "p_name": np.char.add(np.char.add(adj, " "), noun),
                "p_brand": np.array([f"Brand#{b}" for b in range(25)])[
                    r.integers(0, 25, m)],
                "p_type": np.array(PTYPES)[r.integers(0, len(PTYPES), m)],
                "p_size": r.integers(1, 51, m).astype(np.int32),
                # the sf0.1 rule: 900 + (partkey % 1000)/10
                "p_retailprice": 900.0 + (k % 1000) / 10.0,
            }
    write(out, "part", batches_part())

    def batches_orders():
        for off, m in chunked(n_ord):
            r = np.random.default_rng((4, off))
            k = np.arange(off, off + m, dtype=np.int64)
            days = r.integers(0, ODATE_DAYS + 1, m)
            yield {
                "o_orderkey": k,
                "o_custkey": r.integers(0, n_cust, m),
                "o_orderstatus": np.array(OSTATUS)[r.integers(0, 3, m)],
                "o_totalprice": np.round(r.uniform(1000, 500000, m), 2),
                "o_orderdate": (EPOCH_1995 + days).astype("datetime64[us]"),
                "o_orderpriority": np.array(OPRIO)[r.integers(0, 5, m)],
            }
    write(out, "orders", batches_orders())

    # lineitem: ~4 lines per order (Poisson(4) clipped to >= 1), dense
    # orderkeys — generated order-chunk-wise so line numbers stay per-order
    def batches_lineitem():
        for off, m in chunked(n_ord, chunk=500_000):
            r = np.random.default_rng((5, off))
            per = np.clip(r.poisson(4.0, m), 1, 17)
            ok = np.repeat(np.arange(off, off + m, dtype=np.int64), per)
            ln = (np.arange(per.sum()) -
                  np.repeat(np.cumsum(per) - per, per) + 1).astype(np.int32)
            t = per.sum()
            qty = r.integers(1, 51, t).astype(np.float64)
            yield {
                "l_orderkey": ok,
                "l_partkey": r.integers(0, n_part, t),
                "l_suppkey": r.integers(0, n_supp, t),
                "l_linenumber": ln,
                "l_quantity": qty,
                "l_extendedprice": np.round(qty * r.uniform(900, 2100, t), 2),
                "l_discount": np.round(r.integers(0, 11, t) / 100.0, 2),
                "l_tax": np.round(r.integers(0, 9, t) / 100.0, 2),
                "l_returnflag": np.array(RFLAG)[r.integers(0, 3, t)],
                "l_linestatus": np.array(LSTATUS)[r.integers(0, 2, t)],
                "l_shipdate": (EPOCH_1995 + np.int64(1) +
                               r.integers(0, SHIP_DAYS, t)).astype("datetime64[us]"),
            }
    write(out, "lineitem", batches_lineitem())

    def batches_events():
        # each chunk owns a DISJOINT proportional slice of the 30-day
        # span (sorted within the chunk), so the table is GLOBALLY
        # time-ordered at any factor — sf0.1 is one chunk and therefore
        # globally sorted, and a faithful scale-up must keep the natural
        # time clustering (row-group min/max pruning, sessionization
        # shuffle shapes) rather than interleave 2M-row windows that
        # each span the whole month. factor 1 reproduces the old bytes
        # exactly (single chunk -> slice == full span).
        for off, m in chunked(n_ev):
            r = np.random.default_rng((6, off))
            lo = int(EV_SPAN_US) * off // n_ev
            hi = int(EV_SPAN_US) * (off + m) // n_ev
            yield {
                "event_id": np.arange(off, off + m, dtype=np.int64),
                "ts": (EV_T0_US + lo + np.sort(r.integers(0, hi - lo, m))
                       ).astype("datetime64[us]"),
                "user_id": r.integers(0, n_user, m),
                "event_type": np.array(ETYPES)[r.integers(0, 5, m)],
                "value": np.round(r.exponential(50.0, m), 2),
                "props": np.array([f'{{"k": {v}}}' for v in
                                   r.integers(0, 100, m)]),
            }
    write(out, "events", batches_events())

    # Vocabulary GROWS with the corpus (Heaps' law): at a fixed 31-word
    # vocab, 100x the documents makes natural near-dup candidate pairs
    # grow ~quadratically (the 2-gram shingle space is only 31^2), which
    # blows the minhash verify join's shuffle past the disk at sf10 —
    # observed: 304 capped buckets / 184M suppressed candidates / >200 GB
    # of spill. sqrt(factor) growth keeps the near-dup family structure
    # proportional to sf0.1 (factor 1 reproduces the sf0.1 vocab exactly).
    def batches_documents():
        extra = len(VOCAB) * (int(np.ceil(np.sqrt(f))) - 1)
        voc = np.array(VOCAB + [f"w{i}" for i in range(extra)])
        for off, m in chunked(n_doc, chunk=200_000):
            r = np.random.default_rng((7, off))
            lens = r.integers(10, 101, m)
            toks = voc[r.integers(0, len(voc), lens.sum())]
            bounds = np.cumsum(lens)[:-1]
            texts = [" ".join(d) for d in np.split(toks, bounds)]
            k = np.arange(off, off + m, dtype=np.int64)
            yield {
                "doc_id": k,
                "text": texts,
                "lang": np.array(LANGS)[r.choice(len(LANGS), m, p=LANG_P)],
                "source": np.array([f"src{i % 20}" for i in k]),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
    write(out, "documents", batches_documents())

    def batches_embeddings():
        for off, m in chunked(n_vec, chunk=200_000):
            r = np.random.default_rng((8, off))
            v = r.standard_normal((m, 64)).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield {
                "vec_id": np.arange(off, off + m, dtype=np.int64),
                "embedding": list(v),
                "label": r.integers(0, 10, m).astype(np.int32),
            }
    write(out, "embeddings", batches_embeddings())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=100,
                    help="row-count multiple of sf0.1 (100 = sf10)")
    a = ap.parse_args()
    gen(a.out, a.factor)
    print("done:", a.out)
