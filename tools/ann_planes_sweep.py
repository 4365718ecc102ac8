"""ANN persisted-index (planes × multi_probe) sweep: build the
signature-partitioned index at several plane counts over a clustered
synthetic corpus (the realistic embedding shape) and, for each, probe at
several Hamming radii — measuring build wall, probe wall, rows scanned
by the partition-pruned probe, and mean recall@10 vs exact over a query
panel.

Evidence for two documented defaults (VERDICT r4 item 7):
- ``planes_for()``: planes ≈ log2(n/target_bucket) — more planes =>
  smaller buckets => cheaper probes at lower single-bucket recall;
- ``multi_probe``: Hamming-1 probing covers 1+planes of the 2^planes
  buckets, a SHRINKING fraction as planes grows, so the radius must grow
  with the plane count. Rule derived from this sweep (see
  BENCH/BASELINE.md): multi_probe = max(1, round(planes/8)) holds
  recall@10 ≈ 0.9 across the sweep while scanning <~1% of the corpus.

Usage: python tools/ann_planes_sweep.py [n_vectors] [dims] [n_queries]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webcrawlerfull_spark.operators import similarity as SIM  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="ann-sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(11)
    n_clusters = max(50, n // 200)
    centers = rng.normal(size=(n_clusters, dims))
    cid = rng.integers(0, n_clusters, size=n)
    pts = centers[cid] + 0.05 * rng.normal(size=(n, dims))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    emb.count()

    # query panel: perturbed cluster centers (in-distribution queries —
    # the re-embedding / near-dup-lookup shape)
    q_centers = rng.integers(0, n_clusters, size=n_queries)
    queries = [
        [float(x) for x in centers[c] + 0.02 * rng.normal(size=dims)]
        for c in q_centers
    ]
    exact = {
        qi: [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10).collect()]
        for qi, qv in enumerate(queries)
    }

    out = {
        "n": n,
        "dims": dims,
        "n_queries": n_queries,
        "planes_for_1024": SIM.planes_for(n, 1024),
    }
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for planes in (8, 12, 16, 20):
            path = os.path.join(tmp, f"idx{planes}")
            t0 = time.monotonic()
            SIM.write_lsh_index(emb, path, dims=dims, planes=planes)
            build = time.monotonic() - t0
            idx = spark.read.parquet(path)
            cell = {"build_sec": round(build, 2), "probes": {}}
            for mp in (0, 1, 2, 3):
                hits = 0
                scanned = 0
                t0 = time.monotonic()
                for qi, qv in enumerate(queries):
                    approx = [
                        r["vec_id"]
                        for r in SIM.lsh_topk_indexed(
                            spark, path, qv, k=10, multi_probe=mp
                        ).collect()
                    ]
                    hits += len(set(exact[qi]) & set(approx))
                probe_wall = (time.monotonic() - t0) / n_queries
                # rows the partition-pruned probe scans (mean over panel)
                for qv in queries:
                    sigs = SIM.probe_signatures(
                        SIM.query_signature(qv, dims, planes), mp
                    )
                    scanned += idx.where(F.col("sig").isin(sigs)).count()
                scanned //= n_queries
                cell["probes"][f"mp{mp}"] = {
                    "recall_at_10": round(hits / (10 * n_queries), 3),
                    "probe_sec_mean": round(probe_wall, 3),
                    "rows_scanned_mean": scanned,
                    "scan_frac": round(scanned / n, 5),
                }
            results[f"planes{planes}"] = cell
    out["sweep"] = results
    # the derived default rule, evaluated in-line so the JSON shows what
    # the rule would have picked and the recall it lands on
    rule = {
        p: max(1, round(p / 8)) for p in (8, 12, 16, 20)
    }
    out["rule_multi_probe"] = {
        f"planes{p}": {
            "mp": mp,
            "recall_at_10": results[f"planes{p}"]["probes"][f"mp{mp}"][
                "recall_at_10"
            ],
        }
        for p, mp in rule.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
