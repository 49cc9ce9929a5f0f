"""Driver-emulating correctness sweep: run every ``queries()`` entry and
its ``oracle_sql()`` twin at a given sf dir, compare rows / schema /
value-hash the way the round driver does (columns sorted by name, rows
sorted, values hashed from their string repr — dtype KIND matters:
int64 vs float64 of identical values hashes red, as round 1 proved).

Usage: python tools/correctness_sweep.py [sf_dir] [query ...]

Run SOLO (no concurrent Ray sessions / heavy DuckDB on the box): each
flagship-twin oracle retains ~2k mmaps in-process (DuckDB jemalloc
retained VM; measured round 5), and concurrent heavy processes have
produced transient mmap failures ("bad allocation" on KB blocks,
"can't start new thread") well before RAM runs out — vm.max_map_count
is 65530 here.  The full 205-query sweep fits comfortably when solo.
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _to_df(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            rep = col.round(6).astype(str)
        else:
            rep = col.astype(str)
        h.update(("\x00".join(rep.tolist())).encode())
        h.update(b"\x01")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    report: dict[str, dict] = {}
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        try:
            rdf = _canon(_to_df(fn(sf_dir)))
            row["rows"] = len(rdf)
            if name in oracles:
                odf = _canon(con.sql(oracles[name]).df())
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(rdf) == len(odf)
                row["schema_match"] = list(rdf.columns) == list(odf.columns)
                kinds_r = [d.kind.replace("u", "i") for d in rdf.dtypes]
                kinds_o = [d.kind.replace("u", "i") for d in odf.dtypes]
                row["kind_match"] = kinds_r == kinds_o
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _value_hash(rdf) == _value_hash(odf)
                )
                if not row["hash_match"]:
                    fails += 1
                    row["ray_dtypes"] = [str(d) for d in rdf.dtypes]
                    row["oracle_dtypes"] = [str(d) for d in odf.dtypes]
            else:
                row["oracle"] = None
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            fails += 1
        report[name] = row
        status = (
            "ERR"
            if "err" in row
            else ("green" if row.get("hash_match") else
                  ("rows-only" if "oracle" in row else "HASH-FAIL"))
        )
        print(f"{name:32s} {status}", flush=True)

    print(json.dumps(report, indent=1, default=str))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
