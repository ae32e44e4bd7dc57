#!/usr/bin/env python3
"""Dev-only parity checker mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet the Verify main dumped, runs the matching SQL from
oracle_sql.json in DuckDB over the same source tables, and compares after
sorting columns by name and rows by all columns.
"""
import json
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_drift(g: pd.DataFrame, e: pd.DataFrame) -> str:
    """Return a description of the first dtype mismatch between the engine
    frame g and oracle frame e, ignoring integer-width widening (int32 vs
    int64) and object-vs-string spellings. Float-vs-int IS drift: the
    driver's hash renders 1 and 1.0 differently."""
    def kind(dt) -> str:
        s = str(dt)
        if s.startswith(("int", "Int", "uint", "UInt")):
            return "int"
        if s.startswith(("float", "Float")):
            return "float"
        if s.startswith(("object", "string", "str")):
            return "str"
        if s.startswith("datetime64"):
            return "ts"
        if s.startswith("bool"):
            return "bool"
        return s
    for c in g.columns:
        kg, ke = kind(g[c].dtype), kind(e[c].dtype)
        if kg != ke:
            # a float oracle col whose values are all integral but whose
            # engine side is int is exactly the HUGEINT trap
            return f"col={c}: engine {g[c].dtype} vs oracle {e[c].dtype}"
    return ""


def render_drift(g: pd.DataFrame, e: pd.DataFrame) -> str:
    """Return the first RENDERED divergence between numerically-equal
    frames. The driver hashes rendered values, where -0.0 != 0.0 (and any
    other repr split fails) even though pandas check_exact passes — the
    r11 q614/q640 blind spot. Nulls are normalized first: parquet None vs
    DuckDB NaN in object columns is a pandas artifact the driver's own
    hash already tolerates (q487/q504 would false-positive otherwise).
    Run only after assert_frame_equal passed."""
    for c in g.columns:
        gc = g[c].where(pd.notna(g[c]), None)
        ec = e[c].where(pd.notna(e[c]), None)
        gs = gc.map(lambda x: "NULL" if x is None else str(x))
        es = ec.map(lambda x: "NULL" if x is None else str(x))
        neq = (gs != es)
        if neq.any():
            i = neq.idxmax()
            return f"col={c} row={i}: rendered {gs[i]!r} vs {es[i]!r}"
    return ""


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = pd.read_parquet(path)
        if name not in oracles:
            status = f"rows-only rows={len(got)}"
            ok = len(got) > 0
        else:
            try:
                exp = con.execute(oracles[name]).fetchdf()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
                continue
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                ok, status = False, f"columns {list(g.columns)} vs {list(e.columns)}"
            elif len(g) != len(e):
                ok, status = False, f"rowcount {len(g)} vs {len(e)}"
            elif dtype_drift(g, e):
                # the driver hashes RENDERED values, so int64 vs float64
                # (DuckDB HUGEINT -> pandas float64) fails there even when
                # values compare equal; catch that class here (r6 verdict).
                ok, status = False, "dtype drift: " + dtype_drift(g, e)
            else:
                try:
                    pd.testing.assert_frame_equal(
                        g, e, check_dtype=False, check_exact=True)
                    rd = render_drift(g, e)
                    if rd:
                        ok, status = False, "render drift: " + rd
                    else:
                        ok, status = True, f"match rows={len(g)}"
                except AssertionError as ex:
                    ok, status = False, "value mismatch: " + str(ex).split("\n")[0]
                    # show first differing cells
                    for c in g.columns:
                        neq = (g[c].astype(str) != e[c].astype(str))
                        if neq.any():
                            i = neq.idxmax()
                            status += f" | col={c} row={i}: {g[c][i]!r} vs {e[c][i]!r}"
                            break
        if ok:
            n_pass += 1
            print(f"PASS {name}: {status}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {status}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
