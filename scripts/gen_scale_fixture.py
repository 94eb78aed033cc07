"""Deterministic scale-fixture generator for the empirical scale probe
(SCALEPROBE.md). Mirrors the driver fixture's schemas and value
distributions (inspected from /root/testdata/sf0.1 — seed-42 synthetic
TPC-H-ish tables, TESTDATA.md) at arbitrary scale factors, so the SAME
queries can be timed at two scales generated from the SAME recipe and
the wall-time ratio estimates the scaling exponent.

One deliberate divergence, documented in SCALEPROBE.md: the driver's
documents table draws from a FIXED 31-word vocabulary, which makes any
shingle equi-join quadratic BY CONSTRUCTION (shingle frequency grows
linearly with corpus size, pair space quadratically). Real corpora grow
vocabulary with size (Heaps' law), which is what bounds shingle
frequency and keeps those joins near-linear — so this generator scales
the vocabulary with the corpus (Zipf-weighted over the real 31 words +
generated tail). 2% of documents/embeddings are planted near-duplicates
so the dedup/LSH paths have real work.

Row counts at scale s (s=1.0 -> "sf1", 10x the driver's sf0.1):
lineitem 6M, orders 1.5M, customer 150k, part 200k, supplier 10k,
events 1M, documents 50k, embeddings 20k; nation/region fixed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REAL_VOCAB = (
    "a agg batch big column data fast filter group hash join key line "
    "merge order part query row scan slow small sort spark stream table "
    "value vector window cache disk index"
).split()

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
LANGS = (["en"] * 6) + ["de", "fr", "es", "ja"]
ADJS = ["large", "hot", "blue", "dim", "new", "old", "red", "tiny"]
NOUNS = ["ring", "bolt", "case", "gear", "disk", "rod", "cap", "pin"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]


def _write(out_dir: str, name: str, cols: dict, schema: pa.Schema) -> None:
    t = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))


def _ts(rng, n, lo: str, hi: str):
    lo_us = np.datetime64(lo).astype("datetime64[us]").astype(np.int64)
    hi_us = np.datetime64(hi).astype("datetime64[us]").astype(np.int64)
    return rng.integers(lo_us, hi_us, n)


def generate(out_dir: str, scale: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_li = int(6_000_000 * scale)
    n_ord = int(1_500_000 * scale)
    n_cust = int(150_000 * scale)
    n_part = int(200_000 * scale)
    n_supp = int(10_000 * scale)
    n_ev = int(1_000_000 * scale)
    n_doc = int(50_000 * scale)
    n_vec = int(20_000 * scale)
    n_users = int(15_000 * scale)

    # --- region / nation (fixed dims) ------------------------------------
    _write(out_dir, "region",
           {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS},
           pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    _write(out_dir, "nation",
           {"n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
           pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                      ("n_regionkey", pa.int32())]))

    # --- customer / supplier / part --------------------------------------
    _write(out_dir, "customer",
           {"c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]},
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]))
    _write(out_dir, "supplier",
           {"s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)},
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))
    _write(out_dir, "part",
           {"p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [f"{ADJS[i % 8]} {NOUNS[(i // 8) % 8]}"
                       for i in range(n_part)],
            "p_brand": [f"Brand#{i % 20}" for i in range(n_part)],
            "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
            "p_size": rng.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2)},
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # --- orders / lineitem ------------------------------------------------
    _write(out_dir, "orders",
           {"o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _ts(rng, n_ord, "1995-01-01", "2001-08-01"),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]},
           pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                      ("o_orderstatus", pa.string()),
                      ("o_totalprice", pa.float64()),
                      ("o_orderdate", pa.timestamp("us")),
                      ("o_orderpriority", pa.string())]))
    _write(out_dir, "lineitem",
           {"l_orderkey": rng.integers(0, n_ord, n_li),
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": _ts(rng, n_li, "1995-01-01", "2001-11-05")},
           pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()),
                      ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()),
                      ("l_linestatus", pa.string()),
                      ("l_shipdate", pa.timestamp("us"))]))

    # --- events -----------------------------------------------------------
    _write(out_dir, "events",
           {"event_id": np.arange(n_ev, dtype=np.int64),
            "ts": _ts(rng, n_ev, "2024-01-01", "2024-01-31"),
            "user_id": rng.integers(0, n_users, n_ev),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.gamma(1.2, 40.0, n_ev), 2),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)]},
           pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                      ("user_id", pa.int64()), ("event_type", pa.string()),
                      ("value", pa.float64()), ("props", pa.string())]))

    # --- documents (Heaps-law vocabulary + 2% planted near-dups) ----------
    vocab = REAL_VOCAB + [f"w{i:05d}" for i in range(max(100, int(3000 * scale)))]
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()  # Zipf
    lens = rng.integers(8, 101, n_doc)
    word_ids = rng.choice(len(vocab), size=int(lens.sum()), p=probs)
    varr = np.array(vocab)
    texts: list[str] = []
    off = 0
    for ln in lens:
        texts.append(" ".join(varr[word_ids[off:off + ln]]))
        off += ln
    # plant near-dups: doc i copies doc i-1 with the first word changed
    for i in range(50, n_doc, 50):
        texts[i] = "dup " + texts[i - 1][texts[i - 1].index(" ") + 1:]
    _write(out_dir, "documents",
           {"doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
            "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))

    # --- embeddings (2% planted near-dup vectors) -------------------------
    emb = rng.normal(0, 1, (n_vec, 64)).astype(np.float32)
    for i in range(50, n_vec, 50):
        emb[i] = emb[i - 1] + rng.normal(0, 0.01, 64).astype(np.float32)
    _write(out_dir, "embeddings",
           {"vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": list(emb),
            "label": rng.integers(0, 10, n_vec).astype(np.int32)},
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]))

    generate_changes(out_dir, scale)


def generate_changes(out_dir: str, scale: float) -> None:
    """Change-stream fixture for the CDC-apply scale probe (round-4
    verdict item 4): a keyed update log shaped like an unwrapped CDC
    topic. Own rng stream (SEED+1) so it can be (re)generated standalone
    without disturbing the main tables' determinism.

    Shape at scale s: 1M*s rows over 500k*s keys — keyspace ~2x smaller
    than the row count so most keys see multiple versions (the fold has
    real work). Columns: k (key), pos (global commit position), v
    (payload), body (LOB column: ~10% Debezium unavailable-value
    placeholders + ~5% explicit NULLs, exercising inheritance), __op
    (80/15/5 u/c/d). The probe slices deltas out of the tail by fixed
    ABSOLUTE key cutoffs (k < 150 → ~50 rows at every scale), so the
    fixed-delta measurement holds the delta constant while state grows
    10x."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + 1)
    n_keys = int(500_000 * scale)
    n_chg = 2 * n_keys
    k = rng.integers(0, n_keys, n_chg)
    opr = rng.random(n_chg)
    op = np.where(opr < 0.80, "u", np.where(opr < 0.95, "c", "d"))
    br = rng.random(n_chg)
    body = [
        None if b < 0.05
        else "__debezium_unavailable_value" if b < 0.15  # noqa: placeholder
        else f"body{p % 1000}"
        for p, b in enumerate(br)
    ]
    _write(out_dir, "changes",
           {"k": k.astype(np.int64),
            "pos": np.arange(n_chg, dtype=np.int64),
            "v": np.round(rng.uniform(0, 1000, n_chg), 3),
            "body": body,
            "__op": op},
           pa.schema([("k", pa.int64()), ("pos", pa.int64()),
                      ("v", pa.float64()), ("body", pa.string()),
                      ("__op", pa.string())]))


if __name__ == "__main__":
    import sys

    out, scale = sys.argv[1], float(sys.argv[2])
    if len(sys.argv) > 3 and sys.argv[3] == "changes":
        generate_changes(out, scale)
        print(f"generated changes-only scale={scale} at {out}")
    else:
        generate(out, scale)
        print(f"generated scale={scale} at {out}")
