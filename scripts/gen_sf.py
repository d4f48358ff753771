#!/usr/bin/env python3
"""Generate the sf1 (or any multiplier) variants of the three tables the
heavy LLM-pipeline / events entries read — documents, embeddings,
events — matching the driver's sf0.1 schemas and distributions exactly
(vocab extracted from sf0.1 itself; events ts as parquet
TIMESTAMP(NANOS) so graft.util.Tables.load reads both identically).

The driver's /root/testdata is read-only and stops at sf0.1; the
scaling-curve bench (README "Scale-factor sensitivity") needs one more
decade to separate fixed overhead from data-proportional cost, so this
writes /tmp/graft_sf1 by default. Deterministic: seed fixed, no wall
clock anywhere.

Usage: gen_sf.py [outdir] [multiplier-vs-sf0.1]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 10
BASE = "/root/testdata/sf0.1"
SEED = 42

import os
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(SEED)
con = duckdb.connect()

# ---- documents: random words over the sf0.1 vocab, same source/lang
# mix, same 10..100 words/doc, same ~0.16% exact-dup tail ----
vocab = [r[0] for r in con.execute(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
    f"FROM '{BASE}/documents.parquet' ORDER BY 1").fetchall()]
langs, lang_w = zip(*[(r[0], r[1]) for r in con.execute(
    f"SELECT lang, count(*) FROM '{BASE}/documents.parquet' GROUP BY 1 "
    f"ORDER BY 1").fetchall()])
lang_p = np.array(lang_w, dtype=float) / sum(lang_w)
n_docs = 5000 * MULT
n_dups = round(n_docs * 8 / 5000)
lens = rng.integers(10, 101, size=n_docs)
words = np.array(vocab)
texts = [" ".join(words[rng.integers(0, len(words), size=l)])
         for l in lens]
# exact-dup tail: the last n_dups docs repeat earlier texts verbatim
for i in range(n_dups):
    texts[n_docs - n_dups + i] = texts[rng.integers(0, n_docs - n_dups)]
docs = pa.table({
    "doc_id": pa.array(range(n_docs), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(rng.choice(langs, size=n_docs, p=lang_p), pa.string()),
    "source": pa.array([f"src{i % 20}" for i in range(n_docs)], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(docs, f"{OUT}/documents.parquet")
print(f"documents: {n_docs} rows ({n_dups} exact dups)")

# ---- embeddings: 64-dim unit-norm gaussian vectors, labels 0..9,
# with a 0.5% planted near-duplicate tail (perturbed copies,
# cos > 0.99) so the near-dup/cluster operators have real work ----
n_vecs = 2000 * MULT
vecs = rng.standard_normal((n_vecs, 64)).astype(np.float32)
n_near = n_vecs // 200
for i in range(n_near):
    src = rng.integers(0, n_vecs - n_near)
    vecs[n_vecs - n_near + i] = (
        vecs[src] + rng.standard_normal(64).astype(np.float32) * 0.02)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
emb = pa.table({
    "vec_id": pa.array(range(n_vecs), pa.int64()),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, size=n_vecs), pa.int32()),
})
pq.write_table(emb, f"{OUT}/embeddings.parquet")
print(f"embeddings: {n_vecs} rows")

# ---- events: 30 days, 10x users, 5 uniform types, int props ----
n_events = 100000 * MULT
n_users = 1500 * MULT
span_ns = 30 * 86400 * 10**9
t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
ts = np.sort(t0 + rng.integers(0, span_ns, size=n_events))
types = np.array(["view", "click", "purchase", "signup", "error"])
events = pa.table({
    "event_id": pa.array(range(n_events), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, n_users, size=n_events), pa.int64()),
    "event_type": pa.array(rng.choice(types, size=n_events), pa.string()),
    "value": pa.array(np.round(rng.uniform(0, 560, size=n_events), 2),
                      pa.float64()),
    "props": pa.array([f'{{"k": {k}}}' for k in
                       rng.integers(0, 100, size=n_events)], pa.string()),
})
pq.write_table(events, f"{OUT}/events.parquet")
print(f"events: {n_events} rows, {n_users} users")

# ---- relational tables (round 15): the q-family additions
# (itemsets/similarity self-joins, decorrelation shapes) need a
# lineitem decade too. Dims copy sf0.1 where they are fixed-size
# (region/nation); fact-ish tables scale by MULT with the same key
# domains, value ranges and 1..7 lines-per-order shape as sf0.1. ----
import shutil
for t in ("region", "nation"):
    shutil.copyfile(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")

n_supp = 1000 * MULT
supplier = pa.table({
    "s_suppkey": pa.array(range(n_supp), pa.int64()),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
    "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
    "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
})
pq.write_table(supplier, f"{OUT}/supplier.parquet")

segs = [r[0] for r in con.execute(
    f"SELECT DISTINCT c_mktsegment FROM '{BASE}/customer.parquet' "
    f"ORDER BY 1").fetchall()]
n_cust = 15000 * MULT
customer = pa.table({
    "c_custkey": pa.array(range(n_cust), pa.int64()),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
    "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
    "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
    "c_mktsegment": pa.array(rng.choice(segs, n_cust)),
})
pq.write_table(customer, f"{OUT}/customer.parquet")

names = [r[0] for r in con.execute(
    f"SELECT DISTINCT p_name FROM '{BASE}/part.parquet' ORDER BY 1")
    .fetchall()]
types = [r[0] for r in con.execute(
    f"SELECT DISTINCT p_type FROM '{BASE}/part.parquet' ORDER BY 1")
    .fetchall()]
n_part = 20000 * MULT
part = pa.table({
    "p_partkey": pa.array(range(n_part), pa.int64()),
    "p_name": pa.array(rng.choice(names, n_part)),
    "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
    "p_type": pa.array(rng.choice(types, n_part)),
    "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
    "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
})
pq.write_table(part, f"{OUT}/part.parquet")

n_ord = 150000 * MULT
day_ns = 86400 * 10**9
od0 = np.datetime64("1995-01-01", "ns").astype(np.int64)
odate = od0 + rng.integers(0, 2400, n_ord) * day_ns
orders = pa.table({
    "o_orderkey": pa.array(range(n_ord), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
    "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], n_ord)),
    "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
    "o_orderdate": pa.array(odate // 1000, pa.timestamp("us")),
    "o_orderpriority": pa.array(rng.choice(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        n_ord)),
})
pq.write_table(orders, f"{OUT}/orders.parquet")

lines_per = rng.integers(1, 8, n_ord)
l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
n_li = len(l_ok)
l_ln = np.concatenate([np.arange(1, k + 1) for k in lines_per])
l_ship = np.repeat(odate, lines_per) + rng.integers(1, 95, n_li) * day_ns
lineitem = pa.table({
    "l_orderkey": pa.array(l_ok),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
    "l_linenumber": pa.array(l_ln, pa.int32()),
    "l_quantity": pa.array(np.round(rng.uniform(1, 50, n_li), 1)),
    "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
    "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
    "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
    "l_returnflag": pa.array(rng.choice(["N", "A", "R"], n_li)),
    "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
    "l_shipdate": pa.array(l_ship // 1000, pa.timestamp("us")),
})
pq.write_table(lineitem, f"{OUT}/lineitem.parquet")
print(f"relational: {n_li} lineitem, {n_ord} orders, {n_part} parts")
