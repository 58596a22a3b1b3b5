#!/usr/bin/env python3
"""Builder-side synthetic data generator for SCALING runs.

Reproduces the driver testdata's schema and approximate distributions
(TESTDATA.md tables) at an arbitrary scale factor, so the bench can be
run one SF up (sf1) and per-query scaling ratios published in SURVEY
§9f. Deterministic (seed 42). NOT a byte-replica of the driver data —
correctness gates stay on /root/testdata; this exists only to measure
how each query's runtime scales.

Usage: python3 tools/gen_sf.py <sf> <outdir>   # e.g. 1 /tmp/graft_sf1
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
out = sys.argv[2]
os.makedirs(out, exist_ok=True)
rel = sf / 0.1  # counts below are the observed sf0.1 counts
rng = np.random.default_rng(42)

N_CUST = int(15000 * rel)
N_PART = int(20000 * rel)
N_SUPP = int(1000 * rel)
N_ORD = int(150000 * rel)
N_EVT = int(100000 * rel)
N_USER = int(1500 * rel)
N_DOC = int(5000 * rel)
N_EMB = int(2000 * rel)

DAY = np.timedelta64(1, "D")
# NOTE: datetime64[D] arrays MUST be .astype("datetime64[us]") before
# pa.array(..., timestamp("us")) — the direct conversion mis-reads the
# day-width buffer and interleaves 1970 epochs.
US = np.timedelta64(1, "us")


def write(name, cols):
    pq.write_table(pa.table(cols), os.path.join(out, name + ".parquet"))
    print(name, len(next(iter(cols.values()))))


# --- dims -------------------------------------------------------------
write("region", {
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("nation", {
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
})

SEGS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
write("customer", {
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999, 9999, N_CUST), 2),
    "c_mktsegment": [SEGS[i] for i in rng.integers(0, 5, N_CUST)],
})
write("supplier", {
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999, 9999, N_SUPP), 2),
})

ADJ = ["large", "hot", "blue", "small", "dim", "cold", "red", "green"]
NOUN = ["ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
pk = np.arange(N_PART)
write("part", {
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
               zip(rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART))],
    "p_brand": [f"Brand#{b + 1}" for b in rng.integers(0, 25, N_PART)],
    "p_type": [TYPES[i] for i in rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
})

# --- orders / lineitem ------------------------------------------------
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["O", "P", "F"]
base = np.datetime64("1995-01-01")
odate_days = rng.integers(0, 2405, N_ORD)  # through 2001-08-01
write("orders", {
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": [STATUS[i] for i in rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array((base + odate_days * DAY).astype("datetime64[us]"), pa.timestamp("us")),
    "o_orderpriority": [PRIO[i] for i in rng.integers(0, 5, N_ORD)],
})

lines_per = rng.integers(1, 8, N_ORD)  # avg ~4 lines/order
okey = np.repeat(np.arange(N_ORD), lines_per)
n_li = len(okey)
linenum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
ship = base + (np.repeat(odate_days, lines_per)
               + rng.integers(1, 96, n_li)) * DAY
write("lineitem", {
    "l_orderkey": pa.array(okey, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, n_li), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, n_li), pa.int64()),
    "l_linenumber": pa.array(linenum, pa.int32()),
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
    "l_returnflag": [["N", "A", "R"][i] for i in rng.integers(0, 3, n_li)],
    "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
    "l_shipdate": pa.array(ship.astype("datetime64[us]"), pa.timestamp("us")),
})

# --- events -----------------------------------------------------------
ETYPES = ["view", "click", "purchase", "signup", "error"]
ebase = np.datetime64("2024-01-01T00:00:00.000000")
ets = np.sort(rng.integers(0, 30 * 86400_000_000, N_EVT))  # µs over 30 days
write("events", {
    "event_id": pa.array(np.arange(N_EVT), pa.int64()),
    "ts": pa.array(ebase + ets * US, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USER, N_EVT), pa.int64()),
    "event_type": [ETYPES[i] for i in rng.integers(0, 5, N_EVT)],
    "value": np.round(np.minimum(rng.exponential(60, N_EVT), 600), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)],
})

# --- documents --------------------------------------------------------
VOCAB = ("spark line column order small sort fast value scan batch part "
         "vector query agg table hash the a join merge group filter big "
         "slow stream key customer").split()
LANGS = ["en", "zh", "fr", "es", "de"]
lang_p = [0.41, 0.15, 0.15, 0.15, 0.14]
nw = rng.integers(8, 111, N_DOC)
docs = [" ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))
        for n in nw]
# a sprinkle of exact duplicates (~0.2%), like the driver data
for i in rng.integers(N_DOC // 2, N_DOC, max(1, N_DOC // 500)):
    docs[i] = docs[i - N_DOC // 2]
write("documents", {
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": docs,
    "lang": [LANGS[i] for i in rng.choice(5, N_DOC, p=lang_p)],
    "source": [f"src{i % 20}" for i in range(N_DOC)],
    "n_chars": pa.array(np.array([len(d) for d in docs]), pa.int64()),
})

# --- embeddings -------------------------------------------------------
emb = rng.normal(0, 1, (N_EMB, 64))
# ~1% near-duplicates of earlier rows (keeps dedup_embedding non-trivial)
for i in rng.integers(N_EMB // 2, N_EMB, max(1, N_EMB // 100)):
    emb[i] = emb[i - N_EMB // 2] + rng.normal(0, 0.01, 64)
emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
write("embeddings", {
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
})
print("done:", out)
