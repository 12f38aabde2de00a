#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each parquet result dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the fixture tables, and
compares values cell-by-cell (exact for ints/strings, bit-exact for
floats — our queries are designed for bit determinism, so any epsilon
is a bug to fix, not to tolerate).

This script is tooling for the build loop only; the shipped library
(src/main/scala) has no Python dependency.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        # driver sorts columns by name before hashing
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        # the driver's hash is typed: a DuckDB HUGEINT (sum of ints, lands
        # as float64 in pandas) vs a Spark BIGINT mismatches even when
        # every cell prints identically (round-1 lesson: 4 queries failed
        # only here). Compare dtype FAMILIES — the driver tolerates
        # int32-vs-int64 (row_number etc.) but not int-vs-float/decimal.
        def fam(dt):
            k = dt.kind
            return {"i": "int", "u": "int", "f": "float",
                    "b": "bool", "M": "ts"}.get(k, str(dt))
        gd = [fam(got[c].dtype) for c in got.columns]
        wd = [fam(want[c].dtype) for c in want.columns]
        if gd != wd:
            diff = {c: (a, b) for c, a, b in zip(got.columns, gd, wd) if a != b}
            print(f"FAIL {name}: dtype mismatch {diff}")
            n_bad += 1
            continue
        bad = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], want[c])):
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        fa, fb = float(a), float(b)
                        if math.isnan(fa) and math.isnan(fb):
                            continue
                        if fa != fb:
                            bad = (c, i, a, b); break
                    elif str(a) != str(b):
                        bad = (c, i, a, b); break
                except Exception:
                    bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duckdb={b!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
