"""Driver-style oracle parity sweep at an arbitrary scale factor.

Runs every queries() entry that has an oracle_sql() through Ray AND DuckDB
and records row-count + column + exact-value equality per query — the same
comparison the correctness driver applies (sorted columns, order-insensitive
rows, bit-exact floats). Usage:

    python BENCH/parity_sweep.py [sf_dir] [out_json]

Defaults: /root/testdata/sf0.01 -> BENCH/parity_sweep_out.json.
Owns its Ray session (script entry point, not driver-imported).
"""

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "parity_sweep_out.json")
    )
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    import __ray_entry__ as em

    qs, sq = em.queries(), em.oracle_sql()
    only = {k for k in os.environ.get("GRAFT_PARITY_ONLY", "").split(",") if k}
    t_all = time.perf_counter()
    per_query, all_green = {}, True
    for name in qs:
        if name not in sq or (only and name not in only):
            continue
        t0 = time.perf_counter()
        try:
            got = _canon(_to_pandas(qs[name](sf_dir)))
            want = _canon(_duck(sq[name], sf_dir))
            green = len(got) == len(want) and list(got.columns) == list(
                want.columns
            )
            if green:
                for c in got.columns:
                    if not all(
                        _eq(x, y) for x, y in zip(got[c].tolist(), want[c].tolist())
                    ):
                        green = False
                        break
            per_query[name] = {
                "green": green,
                "rows": len(got),
                "oracle_rows": len(want),
                "sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001 - sweep must survive one bad query
            per_query[name] = {
                "green": False,
                "error": f"{type(e).__name__}: {e}"[:300],
                "sec": round(time.perf_counter() - t0, 2),
            }
        all_green = all_green and per_query[name]["green"]
        print(name, per_query[name], flush=True)
    out = {
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "checked": len(per_query),
        "all_green": all_green,
        "total_sec": round(time.perf_counter() - t_all, 1),
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("sf", "checked", "all_green", "total_sec")}))
    ray.shutdown()
    return 0 if all_green else 1


if __name__ == "__main__":
    sys.exit(main())
