#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views of the sfDir parquet
tables, sorts columns by name and rows by all columns, and compares values
EXACTLY (strictest possible interpretation of the driver's hash compare).
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def dtype_compatible(a, b):
    """Exact-dtype compare, modulo datetime64 unit (ns/us) only."""
    sa, sb = str(a), str(b)
    if sa == sb:
        return True
    if sa.startswith("datetime64[") and sb.startswith("datetime64["):
        return True
    return False


def norm(table):
    df = table.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


# Type families that have produced driver/local hash divergence on
# value-identical rows: DECIMAL (sim_covariance r5/r6 — the driver's
# DuckDB/hash pipeline renders decimals differently across versions),
# int32 (width-sensitive hash, r5), float32 (same width risk). A gate
# output must never carry one — emit cross-engine-stable types instead
# (BIGINT, DOUBLE, strings, dates/timestamps).
RISKY_TYPE_PREFIXES = ("decimal", "float", "int32", "int16", "int8", "uint")


def warn_risky_types(name, side, arrow_table):
    # pyarrow renders float64 as "double", so the "float" prefix only ever
    # matches float16/float32 — the risky widths — and needs no exemption.
    n_warned = 0
    for field in arrow_table.schema:
        t = str(field.type)
        if t.startswith(RISKY_TYPE_PREFIXES):
            print(
                f"WARN {name}: {side} column '{field.name}' has driver-risk "
                f"type {t} — cast to BIGINT/DOUBLE in the output contract "
                f"(decimal/int32/float32 have all produced driver-side hash "
                f"reds on value-exact rows)"
            )
            n_warned += 1
    return n_warned


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # scale probes: the recursive-CTE oracles (survivor clustering) can
    # materialize tens of GB at 100x — cap DuckDB and let it spill to disk
    # instead of riding an unbounded in-memory connection into the OOM
    # killer (env knob so the sf0.01 gate path stays untouched)
    mem = __import__("os").environ.get("DUCKDB_MEMORY_LIMIT")
    if mem:
        import tempfile
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='duckspill')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = n_warn = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_arrow = pq.read_table(f"{out_dir}/{name}")
            got = norm(got_arrow)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            want_arrow = con.execute(sql).fetch_arrow_table()
            want = norm(want_arrow)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # n_warn counts offending COLUMNS (per side), not just sides, so the
        # summary reflects multi-column offenders
        n_warn += warn_risky_types(name, "spark", got_arrow)
        n_warn += warn_risky_types(name, "oracle", want_arrow)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad_types = [
            (c, str(got[c].dtype), str(want[c].dtype))
            for c in got.columns
            if not dtype_compatible(got[c].dtype, want[c].dtype)
        ]
        if bad_types:
            # the driver's hash is WIDTH-sensitive, not just kind-sensitive:
            # round 5 proved an int32 Spark column vs BIGINT oracle column
            # hash-mismatches even with every value equal (sim_covariance).
            # So compare exact dtypes; the only allowed difference is the
            # datetime64 storage unit (ns vs us), which the driver's hash
            # has passed across 150+ timestamp-bearing gates in rounds 1-5.
            print(f"FAIL {name}: dtype mismatch {bad_types}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch = (c, i, a[i], b[i])
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_warn} type-warnings ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
