"""Scale-up generator: derive an sfN benchmark directory from the
driver's sf0.1 tables (VERDICT r10 #1 — prove the ratios hold an
order of magnitude up).

The driver only ships sf{0.001,0.01,0.1}; the 100 TB story needs at
least one measured decade of scaling.  This script derives
``sf1 = 10x sf0.1`` (or any integer factor) WITHOUT distorting the
properties the benchmark exercises:

- **Relational tables** (customer/supplier/part/orders/lineitem/
  events): replicate ``factor`` times with DENSE KEY SHIFTS
  (``key' = key + r * span``, spans being each table's dense 0..N-1
  keyspace).  Foreign keys shift by the referenced table's span, so
  join fan-out/selectivity per row is IDENTICAL to sf0.1 while key
  cardinalities grow by ``factor`` — exactly how TPC-H scales.
  Non-key attribute distributions are preserved verbatim.
- **documents**: replica 0 is the original corpus; each further
  replica deterministically rewrites ~30% of tokens (seeded RNG per
  (replica)) so replicas are NEITHER exact duplicates (which would
  blow up every dedup pair generator quadratically — an sf artifact,
  not scale) NOR near-dups at typical 0.7–0.9 thresholds (~0.5
  Jaccard at 30% replacement).  Near-dup density per document stays
  ~flat, as it would in a real corpus growing 10x.
- **embeddings**: replicas get seeded Gaussian noise (sigma=0.2 per
  dim before renormalize, ~53 deg expected angle at d=64) and are
  re-unit-normalized — cluster structure (label field) is preserved,
  but replicas are far outside every near-dup/semantic-dup cosine
  threshold, so pair densities scale linearly like a real corpus.
- **region/nation**: fixed dimensions, copied verbatim (same at all
  scale factors, as in TPC-H).

Deterministic: seed 42 throughout; byte-stable across runs.

Usage: python scripts/gen_sf.py [src_dir] [out_dir] [factor]
       (defaults: /root/testdata/sf0.1  <repo>/.benchdata/sf1  10)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _copy(con, src, out, table):
    con.sql(
        f"COPY (SELECT * FROM '{src}/{table}.parquet') "
        f"TO '{out}/{table}.parquet' (FORMAT parquet)"
    )


def _replicate(con, src, out, table, select_sql, factor):
    """Write `factor` key-shifted replicas of `table` via one COPY."""
    con.sql(
        f"COPY (SELECT {select_sql} FROM '{src}/{table}.parquet', "
        f"range(0, {factor}) t(r) ORDER BY r) "
        f"TO '{out}/{table}.parquet' (FORMAT parquet)"
    )


def gen_relational(con, src, out, factor):
    spans = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ]:
        spans[t] = (
            con.sql(f"SELECT max({k}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
        )
    uspan = con.sql(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]

    _copy(con, src, out, "region")
    _copy(con, src, out, "nation")
    c = spans["customer"]
    _replicate(
        con, src, out, "customer",
        f"c_custkey + r * {c} AS c_custkey, "
        f"printf('Customer#%09d', c_custkey + r * {c}) AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
        factor,
    )
    s = spans["supplier"]
    _replicate(
        con, src, out, "supplier",
        f"s_suppkey + r * {s} AS s_suppkey, "
        f"printf('Supplier#%09d', s_suppkey + r * {s}) AS s_name, "
        "s_nationkey, s_acctbal",
        factor,
    )
    p = spans["part"]
    _replicate(
        con, src, out, "part",
        f"p_partkey + r * {p} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice",
        factor,
    )
    o = spans["orders"]
    _replicate(
        con, src, out, "orders",
        f"o_orderkey + r * {o} AS o_orderkey, "
        f"o_custkey + r * {c} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
        factor,
    )
    _replicate(
        con, src, out, "lineitem",
        f"l_orderkey + r * {o} AS l_orderkey, "
        f"l_partkey + r * {p} AS l_partkey, "
        f"l_suppkey + r * {s} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
        factor,
    )
    e = spans["events"]
    _replicate(
        con, src, out, "events",
        f"event_id + r * {e} AS event_id, ts, "
        f"user_id + r * {uspan} AS user_id, event_type, value, props",
        factor,
    )


def gen_documents(con, src, out, factor):
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    n = len(rows)
    vocab = sorted(
        {t for _id, text, _l, _s in rows for t in text.split() if t}
    )
    vocab_arr = np.array(vocab)
    out_ids, out_text, out_lang, out_src, out_nch = [], [], [], [], []
    for r in range(factor):
        rng = np.random.default_rng(42 + r)
        for doc_id, text, lang, source in rows:
            if r == 0:
                new_text = text
            else:
                toks = text.split()
                if toks:
                    mask = rng.random(len(toks)) < 0.30
                    repl = rng.integers(0, len(vocab_arr), size=len(toks))
                    toks = [
                        vocab_arr[repl[i]] if mask[i] else toks[i]
                        for i in range(len(toks))
                    ]
                new_text = " ".join(toks)
            out_ids.append(doc_id + r * n)
            out_text.append(new_text)
            out_lang.append(lang)
            out_src.append(source)
            out_nch.append(len(new_text))
    tbl = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(out_nch, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(con, src, out, factor):
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    n = len(rows)
    base = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    all_ids, all_vecs, all_labels = [], [], []
    for r in range(factor):
        if r == 0:
            vecs = base
        else:
            rng = np.random.default_rng(1042 + r)
            vecs = base + rng.normal(0.0, 0.2, size=base.shape)
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        all_ids.append(ids + r * n)
        all_vecs.append(vecs.astype(np.float32))
        all_labels.append(labels)
    ids_a = np.concatenate(all_ids)
    vecs_a = np.concatenate(all_vecs)
    labels_a = np.concatenate(all_labels)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids_a, pa.int64()),
            "embedding": pa.array(list(vecs_a), pa.list_(pa.float32())),
            "label": pa.array(labels_a, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".benchdata", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_relational(con, src, out, factor)
    gen_documents(con, src, out, factor)
    gen_embeddings(con, src, out, factor)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        cnt = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, cnt)


if __name__ == "__main__":
    main()
