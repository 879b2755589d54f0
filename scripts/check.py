#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sfDir
parquet tables, sorts columns by name + rows, and compares values exactly.

The compare is DTYPE-STRICT before it is value-strict: the driver's hash
is computed over pandas frames whose dtypes follow the DuckDB column
types, so a value-identical result with an un-cast HUGEINT oracle column
(DuckDB's SUM(BIGINT) / SUM() OVER output type) hash-mismatches on the
board even though Python-level value compare passes. r08 shipped 8 such
reds. Rule: after sorting columns by name, the normalized DuckDB type of
every Spark column must equal the oracle column's. Normalization is
CALIBRATED against the r08 driver board (144 green / 8 red): the 8 reds
all carry an un-cast HUGEINT oracle column, while 24 of the greens carry
INTEGER-vs-BIGINT mismatches the driver accepts — so the machine-width
integers (TINYINT..BIGINT) collapse into one class and HUGEINT stays
distinct (int128 leaves the int64 numpy lane; the narrower widths
don't). DECIMAL precisions collapse for the same reason. Checked on the
r08 corpus: red on exactly the 8 known dtype reds before their oracle
casts, green on all 152 after.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_type(t):
    """Normalize a DuckDB type string for the dtype-strict compare."""
    s = str(t).upper()
    # DECIMAL rides pandas' float64 lane like DOUBLE (q07's
    # DECIMAL(_,1) oracle has always hashed green against a DOUBLE).
    # FLOAT deliberately does NOT collapse: unlike the int-width and
    # DECIMAL rules this case has no red/green calibration evidence on
    # any driver board, and DuckDB's Python client materializes REAL as
    # numpy float32 — so a FLOAT-vs-DOUBLE mismatch fails here
    # (conservatively) until a deliberate probe calibrates it.
    s = re.sub(r"DECIMAL\(\d+,\d+\)", "DOUBLE", s)
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT"  # driver-equivalent machine widths; NOT HUGEINT/UBIGINT
    return s


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(tuple(x) if isinstance(x, list) else x for x in r))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        unknown = only - set(oracle)
        if unknown:  # a typo'd name must not report "0 pass / 0 fail" green
            print(f"FAIL: unknown query names in filter: {sorted(unknown)}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            # The driver's comparator sorts with pandas, which cannot hash
            # array cells ("unhashable type: numpy.ndarray") — an
            # oracle-backed output with a LIST column passes here but fails
            # the driver gate. Reject it locally so the incompatibility is
            # visible before the round runs.
            # \[\d*\]$ also catches DuckDB fixed-size ARRAY types such as
            # 'INTEGER[3]', which the bare-'[]' suffix check missed.
            arr_cols = [c for c, t in zip(got_rel.columns, got_rel.types)
                        if re.search(r"\[\d*\]$", str(t)) or "STRUCT" in str(t)
                        or "MAP" in str(t)]
            if arr_cols:
                print(f"FAIL {name}: array/struct columns {arr_cols} are "
                      "not driver-comparable — emit a joined/scalar form")
                n_fail += 1
                continue
            got = canon(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = canon(con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        got_types = {c: norm_type(t)
                     for c, t in zip(got_rel.columns, got_rel.types)}
        exp_types = {c: norm_type(t)
                     for c, t in zip(exp_rel.columns, exp_rel.types)}
        dtype_mismatch = [
            (c, got_types[c], exp_types[c]) for c in got_cols
            if c in exp_types and got_types[c] != exp_types[c]]
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif dtype_mismatch:
            det = "; ".join(f"{c}: spark={g} oracle={e}"
                            for c, g, e in dtype_mismatch)
            print(f"FAIL {name}: dtype mismatch ({det}) — the driver hash "
                  "is dtype-sensitive; cast the oracle (or Spark) side")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            print(f"  got[:2]={got[:2]}\n  exp[:2]={exp[:2]}")
            n_fail += 1
        elif got != exp:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e]
            print(f"FAIL {name}: {len(diffs)}/{len(got)} rows differ; first:")
            print(f"  got={diffs[0][0]}\n  exp={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
