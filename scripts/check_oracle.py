#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
against the DuckDB oracle SQL (oracle_sql.json) on the same tables.

Dev-only tooling — the Scala library never depends on this.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# spill to the system temp dir, never a CWD-relative .tmp/ (a large
# recursive oracle once filled a 12 GB .tmp inside the repo checkout)
con.execute("SET temp_directory = '/tmp/duckdb_spill'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        for v in df[col]:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
    return h.hexdigest()

fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {e}")
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
        continue
    if len(g) != len(e):
        fails.append(name)
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
        continue
    hg, he = table_hash(g), table_hash(e)
    if hg != he:
        fails.append(name)
        print(f"FAIL {name}: hash mismatch ({len(g)} rows)")
        # show first differing cells
        for col in g.columns:
            neq = 0
            for a, b in zip(g[col], e[col]):
                if (a != b) and not (pd.isna(a) and pd.isna(b)):
                    if neq == 0:
                        print(f"  col {col}: first diff spark={a!r} duckdb={b!r}")
                    neq += 1
            if neq:
                print(f"  col {col}: {neq} differing cells")
    else:
        print(f"OK   {name} ({len(g)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
