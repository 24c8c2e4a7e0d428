"""Two-run determinism stand for queries() entries WITHOUT a SQL oracle.

The driver can oracle-check only entries with an oracle_sql(); the rest
(sketches, ML scores, stateful crawl ops, media stages) get the next-best
evidence here: each entry runs TWICE in fresh processes (fresh ray.init
each), and the row count plus a canonical content hash (columns sorted by
name, rows sorted, exact value serialization) must match across the runs.

    python BENCH/stability_check.py [sf_dir] [out_json]

Defaults: /root/testdata/sf0.01 -> BENCH/stability_round5.json.
Child mode (internal): --child <sf_dir> prints one JSON line per key.
"""

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _canon_hash(result) -> tuple[int, str]:
    """(row_count, sha256 over a canonical serialization). Column order,
    row order and chunking must not affect the hash; values must (exact
    float reprs — instability in parallel reduction order is a FINDING,
    not noise to round away)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if isinstance(v, float) or isinstance(v, np.floating):
            return repr(float(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return hashlib.sha256(v).hexdigest()
        return repr(v)

    rows = sorted(
        ",".join(cell(v) for v in rec) for rec in df.itertuples(index=False)
    )
    payload = "|".join(sorted(df.columns)) + "\n" + "\n".join(rows)
    return len(df), hashlib.sha256(payload.encode()).hexdigest()


def child(sf_dir: str) -> int:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    import __ray_entry__ as em

    qs, sq = em.queries(), em.oracle_sql()
    for name, fn in qs.items():
        if name in sq:
            continue
        t0 = time.perf_counter()
        try:
            rows, digest = _canon_hash(fn(sf_dir))
            print(
                "STAB "
                + json.dumps(
                    {
                        "key": name,
                        "rows": rows,
                        "hash": digest,
                        "sec": round(time.perf_counter() - t0, 2),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            print(
                "STAB "
                + json.dumps(
                    {"key": name, "error": f"{type(e).__name__}: {e}"[:300]}
                ),
                flush=True,
            )
    ray.shutdown()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(sys.argv[2])
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "stability_round5.json")
    )
    runs = []
    for i in (1, 2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            return 1
        per = {}
        for ln in proc.stdout.splitlines():
            if ln.startswith("STAB "):
                rec = json.loads(ln[5:])
                per[rec.pop("key")] = rec
        runs.append(per)
        print(f"run {i}: {len(per)} no-oracle entries", flush=True)
    r1, r2 = runs
    per_key, n_stable = {}, 0
    for k in sorted(set(r1) | set(r2)):
        a, b = r1.get(k, {}), r2.get(k, {})
        stable = (
            "error" not in a
            and "error" not in b
            and a.get("rows") == b.get("rows")
            and a.get("hash") == b.get("hash")
        )
        n_stable += stable
        per_key[k] = {
            "stable": stable,
            "rows": a.get("rows"),
            "hash": (a.get("hash") or "")[:16],
            "sec": a.get("sec"),
            **(
                {}
                if stable
                else {"run1": a, "run2": b}
            ),
        }
    out = {
        "sf_dir": sf_dir,
        "checked": len(per_key),
        "stable": n_stable,
        "all_stable": n_stable == len(per_key),
        "per_key": per_key,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {k: out[k] for k in ("checked", "stable", "all_stable")}
        )
    )
    return 0 if out["all_stable"] else 2


if __name__ == "__main__":
    sys.exit(main())
