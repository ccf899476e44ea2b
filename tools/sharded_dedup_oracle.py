#!/usr/bin/env python3
"""Corpus-sharded DuckDB oracle for the incremental-dedup gates at probe
scale — restores DIRECT cross-engine evidence where the one-shot oracle
exceeds this box's disk (r13: >53 GB of DuckDB temp at 100x).

Usage:
  python3 tools/sharded_dedup_oracle.py <sfDir> <verifyOutDir> <gate> \
      [nshards=4] [memory_limit=80GB]

Gates: dedup_ppjoin_indexed | dedup_ppjoin_incremental |
       dedup_incremental_indexed | dedup_incremental

Why sharding the CORPUS is lossless for these two oracles:

- ppjoin (exact Jaccard, prefix filter): each shard run executes the
  COMPLETE exact algorithm over (full batch) x (corpus shard). Document
  frequencies inside a run are shard-local, which changes CANDIDATE sets
  only — any consistent (df, gram) total order satisfies the prefix and
  positional lemmas, and only verified pairs are emitted. Jaccard values
  are functions of the two gram sets alone, so they are bit-identical to
  the full run. Cross pairs partition by the corpus shard of doc_b ->
  plain UNION ALL; batch-internal pairs are emitted by ONE extra run with
  an empty corpus range (vx empty by construction, vi = the full internal
  join under the all-df-0 order).

- incremental LSH (dedup_incremental): a batch doc's matches against the
  corpus are band-key equijoin hits; restricting the corpus side filters
  join rows only, and MIN(survivor) is associative -> global survivor =
  MIN over per-shard survivors. The leftover clustering (rest/rreach) is
  batch-internal: one final run with the corpus branch empty and `rest`
  replaced by the ids unmatched in EVERY shard (injected as a temp
  table). Batch bands are recomputed per run from the same deterministic
  expressions, so shard runs agree bit-for-bit on the batch side.

Self-check: run with sfDir=/root/testdata/sf0.01 and compare against the
direct oracle — the sharded result must be value-identical (the driver
compare, reused from check_oracle)."""
import json
import os
import sys
import tempfile
import time

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, norm  # noqa: E402

PPJOIN_GATES = {"dedup_ppjoin_indexed", "dedup_ppjoin_incremental"}
LSH_GATES = {"dedup_incremental_indexed", "dedup_incremental"}
FAMILY_GATES = {"dedup_ppjoin_batch_family_pairs"}


def replace_once(s, old, new):
    n = s.count(old)
    assert n == 1, f"surgery pattern not unique ({n}x): {old!r}"
    return s.replace(old, new)


def connect(sf_dir, memory_limit):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{memory_limit}'")
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='duckshard')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def shard_ranges(sf_dir, nshards):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()
    lo, hi = min(ids), max(ids) + 1
    step = (hi - lo + nshards - 1) // nshards
    return [(lo + i * step, min(lo + (i + 1) * step, hi))
            for i in range(nshards)]


def run_ppjoin(sf_dir, sql, nshards, memory_limit, scratch):
    shard_sql = replace_once(
        sql, "u AS (SELECT * FROM vx UNION ALL SELECT * FROM vi)",
        "u AS (SELECT * FROM vx)")
    outs = []
    for i, (lo, hi) in enumerate(shard_ranges(sf_dir, nshards)):
        s = replace_once(
            shard_sql, "AS grams FROM documents)",
            f"AS grams FROM documents WHERE doc_id >= {lo} "
            f"AND doc_id < {hi})")
        out = f"{scratch}/cross_{i}.parquet"
        t0 = time.time()
        con = connect(sf_dir, memory_limit)
        con.execute(f"COPY ({s}) TO '{out}' (FORMAT PARQUET)")
        con.close()
        print(f"  shard {i} [{lo},{hi}): {time.time()-t0:.0f}s "
              f"{pq.read_metadata(out).num_rows} pairs", flush=True)
        outs.append(out)
    # internal pairs: empty corpus range -> vx empty, vi = full internal
    s = replace_once(
        sql, "AS grams FROM documents)",
        "AS grams FROM documents WHERE doc_id < doc_id)")
    out = f"{scratch}/internal.parquet"
    t0 = time.time()
    con = connect(sf_dir, memory_limit)
    con.execute(f"COPY ({s}) TO '{out}' (FORMAT PARQUET)")
    con.close()
    print(f"  internal: {time.time()-t0:.0f}s "
          f"{pq.read_metadata(out).num_rows} pairs", flush=True)
    outs.append(out)
    con = duckdb.connect()
    return con.execute(
        "SELECT doc_a, doc_b, jaccard FROM read_parquet($1) "
        "ORDER BY doc_a, doc_b", [outs]).arrow()


def run_family(sf_dir, sql, nshards, memory_limit, scratch):
    """dedup_ppjoin_batch_family_pairs, corpus-sharded.

    Why lossless: batch-side families are computed from the FULL batch in
    every run (bit-identical reps/sizes). Corpus families can SPAN shards
    (the probe's replicas land in different id ranges), so per-shard runs
    emit the corpus family's normalized-text fingerprint alongside the
    shard-local rep/size; the merge re-aggregates per (doc_a, fp):
    global rep = MIN over shard reps (each is the min id within its
    shard), global n_b = SUM over shard counts (shards partition the
    corpus ids), and jaccard is a function of the two gram SETS alone —
    identical in every shard that holds any member of the family.
    Batch-internal ('batch') rows come from one extra empty-corpus run,
    exactly like run_ppjoin.
    """
    cross_sql = replace_once(
        sql, "FROM (SELECT * FROM vx UNION ALL SELECT * FROM vi)",
        "FROM (SELECT * FROM vx)")
    cross_sql = replace_once(
        cross_sql, "ba.n AS n_a, gb.n AS n_b, 'cross' AS kind",
        "ba.n AS n_a, gb.n AS n_b, 'cross' AS kind, gb.fp AS fp")
    cross_sql = replace_once(
        cross_sql, "SELECT doc_a, doc_b, jaccard, n_a, n_b, kind\n",
        "SELECT doc_a, doc_b, jaccard, n_a, n_b, kind, fp\n")
    outs = []
    for i, (lo, hi) in enumerate(shard_ranges(sf_dir, nshards)):
        s = replace_once(
            cross_sql, "AS grams FROM documents)",
            f"AS grams FROM documents WHERE doc_id >= {lo} "
            f"AND doc_id < {hi})")
        out = f"{scratch}/cross_{i}.parquet"
        t0 = time.time()
        con = connect(sf_dir, memory_limit)
        con.execute(f"COPY ({s}) TO '{out}' (FORMAT PARQUET)")
        con.close()
        print(f"  shard {i} [{lo},{hi}): {time.time()-t0:.0f}s "
              f"{pq.read_metadata(out).num_rows} family rows", flush=True)
        outs.append(out)
    # batch-internal rows: empty corpus range -> vx empty, vi = full
    s = replace_once(
        sql, "AS grams FROM documents)",
        "AS grams FROM documents WHERE doc_id < doc_id)")
    internal = f"{scratch}/internal.parquet"
    t0 = time.time()
    con = connect(sf_dir, memory_limit)
    con.execute(f"COPY ({s}) TO '{internal}' (FORMAT PARQUET)")
    con.close()
    print(f"  internal: {time.time()-t0:.0f}s "
          f"{pq.read_metadata(internal).num_rows} family rows", flush=True)
    con = duckdb.connect()
    return con.execute(
        "WITH cross_merged AS ("
        "  SELECT doc_a, MIN(doc_b) AS doc_b, MIN(jaccard) AS jaccard,"
        "         MIN(n_a) AS n_a, CAST(SUM(n_b) AS BIGINT) AS n_b,"
        "         'cross' AS kind"
        "  FROM read_parquet($1) GROUP BY doc_a, fp)"
        "SELECT doc_a, doc_b, jaccard, n_a, n_b, kind FROM cross_merged "
        "UNION ALL "
        "SELECT doc_a, doc_b, jaccard, n_a, n_b, kind FROM read_parquet($2) "
        "ORDER BY kind, doc_a, doc_b", [outs, internal]).arrow()


def run_lsh(sf_dir, sql, nshards, memory_limit, scratch):
    m_sql = replace_once(
        sql,
        "SELECT new_id AS doc_id, survivor_id FROM m\n"
        "UNION ALL SELECT doc_id, survivor_id FROM rsurv\n"
        "ORDER BY doc_id",
        "SELECT new_id AS doc_id, survivor_id FROM m")
    outs = []
    for i, (lo, hi) in enumerate(shard_ranges(sf_dir, nshards)):
        s = replace_once(
            m_sql, "text FROM documents\n",
            f"text FROM documents WHERE doc_id >= {lo} "
            f"AND doc_id < {hi}\n")
        out = f"{scratch}/m_{i}.parquet"
        t0 = time.time()
        con = connect(sf_dir, memory_limit)
        con.execute(f"COPY ({s}) TO '{out}' (FORMAT PARQUET)")
        con.close()
        print(f"  shard {i} [{lo},{hi}): {time.time()-t0:.0f}s "
              f"{pq.read_metadata(out).num_rows} matches", flush=True)
        outs.append(out)
    # merge: global survivor = MIN over shards (associative)
    mcon = duckdb.connect()
    matched = mcon.execute(
        "SELECT doc_id, MIN(survivor_id) AS survivor_id "
        "FROM read_parquet($1) GROUP BY doc_id", [outs]).arrow()
    matched_path = f"{scratch}/matched.parquet"
    pq.write_table(matched, matched_path)
    # leftover clustering: corpus branch empty, rest = globally unmatched
    s = replace_once(
        sql, "text FROM documents\n",
        "text FROM documents WHERE doc_id < doc_id\n")
    s = replace_once(
        s,
        "rest AS (SELECT doc_id FROM incbatch\n"
        "         WHERE doc_id NOT IN (SELECT new_id FROM m)),",
        "rest AS (SELECT doc_id FROM incbatch\n"
        "         WHERE doc_id NOT IN (SELECT doc_id FROM "
        f"read_parquet('{matched_path}'))),")
    s = replace_once(
        s,
        "SELECT new_id AS doc_id, survivor_id FROM m\n"
        "UNION ALL SELECT doc_id, survivor_id FROM rsurv\n"
        "ORDER BY doc_id",
        "SELECT doc_id, survivor_id FROM rsurv")
    out = f"{scratch}/rsurv.parquet"
    t0 = time.time()
    con = connect(sf_dir, memory_limit)
    con.execute(f"COPY ({s}) TO '{out}' (FORMAT PARQUET)")
    con.close()
    print(f"  rest-clustering: {time.time()-t0:.0f}s "
          f"{pq.read_metadata(out).num_rows} rows", flush=True)
    return mcon.execute(
        "SELECT doc_id, survivor_id FROM read_parquet($1) "
        "ORDER BY doc_id", [[matched_path, out]]).arrow()


def main():
    sf_dir, out_dir, gate = sys.argv[1], sys.argv[2], sys.argv[3]
    nshards = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    memory_limit = sys.argv[5] if len(sys.argv) > 5 else "80GB"
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[gate]
    scratch = tempfile.mkdtemp(prefix=f"shardoracle-{gate}-")
    t0 = time.time()
    if gate in PPJOIN_GATES:
        oracle = run_ppjoin(sf_dir, sql, nshards, memory_limit, scratch)
    elif gate in LSH_GATES:
        oracle = run_lsh(sf_dir, sql, nshards, memory_limit, scratch)
    elif gate in FAMILY_GATES:
        oracle = run_family(sf_dir, sql, nshards, memory_limit, scratch)
    else:
        sys.exit(f"unsupported gate {gate}")
    spark = pq.read_table(f"{out_dir}/{gate}")
    a, b = norm(spark), norm(oracle)
    if list(a.columns) != list(b.columns):
        sys.exit(f"FAIL {gate}: columns {list(a.columns)} vs {list(b.columns)}")
    if len(a) != len(b):
        sys.exit(f"FAIL {gate}: rows {len(a)} vs {len(b)}")
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        sys.exit(f"FAIL {gate}: {int(neq.sum())} differing rows, first:\n"
                 f"{a[neq].head()}\nvs\n{b[neq].head()}")
    print(f"PASS {gate} ({len(a)} rows, {nshards} shards, "
          f"{time.time()-t0:.0f}s total, DIRECT sharded-oracle compare)")


if __name__ == "__main__":
    main()
