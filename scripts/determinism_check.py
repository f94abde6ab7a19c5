#!/usr/bin/env python3
"""Registry-wide determinism artifact (r17 verdict ask #2).

Usage: determinism_check.py DIR_A DIR_B OUT.json [note]

DIR_A / DIR_B are two INDEPENDENT `graft.Verify` dumps of the full
registry — separate JVMs (fresh SparkSession each) and, by the seal
recipe, DIFFERENT SPARK_GRAFT_CPUS, so local parallelism, shuffle
partition count, and reduction-tree shape all genuinely differ between
the runs. Every query's parquet output is canonicalized exactly like the
oracle gate (columns sorted by name, rows sorted by all columns, floats
hashed by repr) and the two hashes diffed. A query whose result depends
on partition count, task scheduling, or aggregation order — the
first()/float-sum nondeterminism class the r17 sweep fixed by review —
fails HERE, systematically, instead of waiting to flake the oracle gate.

The artifact records per-query hash pairs and a match flag; exit 1 on
any mismatch or registry asymmetry. Dev/seal tooling — the Scala library
never depends on this.
"""
import json
import sys
import hashlib
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _enc(v) -> bytes:
    if isinstance(v, float):
        return repr(v).encode()
    if hasattr(v, "tolist"):  # numpy array cells: str() elides with '...'
        return repr(v.tolist()).encode()
    return str(v).encode()


def table_hash(df: pd.DataFrame) -> str:
    # every token is length-prefixed (r18 review: bare concatenation lets
    # ['ab','c'] and ['a','bc'] hash identically — exactly the ambiguity a
    # determinism check must not have)
    h = hashlib.sha256()
    for col in df.columns:
        cb = col.encode()
        h.update(b"C%d:%s" % (len(cb), cb))
        for v in df[col]:
            b = _enc(v)
            h.update(b"V%d:%s" % (len(b), b))
    return h.hexdigest()


def main() -> None:
    dir_a, dir_b, out = sys.argv[1:4]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    names_a = set(json.load(open(f"{dir_a}/oracle_sql.json")))
    names_b = set(json.load(open(f"{dir_b}/oracle_sql.json")))
    rows = {}
    mismatched = []
    for q in sorted(names_a | names_b):
        if q not in names_a or q not in names_b:
            rows[q] = {"match": False, "err": "missing from one registry dump"}
            mismatched.append(q)
            continue
        try:
            ha = table_hash(canon(pd.read_parquet(f"{dir_a}/{q}")))
            hb = table_hash(canon(pd.read_parquet(f"{dir_b}/{q}")))
        except Exception as e:  # a failed dump is a determinism failure too
            rows[q] = {"match": False, "err": str(e)}
            mismatched.append(q)
            continue
        ok = ha == hb
        rows[q] = {"hash_a": ha[:16], "hash_b": hb[:16], "match": ok}
        if not ok:
            mismatched.append(q)
    artifact = {
        "method": "two independent Verify dumps (separate JVMs, different "
                  "SPARK_GRAFT_CPUS), per-query canonical sha256 over "
                  "(sorted columns, sorted rows, float repr) diffed",
        "note": note,
        "n_queries": len(rows),
        "n_stable": len(rows) - len(mismatched),
        "mismatched": mismatched,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"{len(rows) - len(mismatched)}/{len(rows)} queries hash-stable "
          f"across independent runs")
    if mismatched:
        print(f"MISMATCHED: {mismatched}")
    sys.exit(1 if mismatched else 0)


if __name__ == "__main__":
    main()
