"""ANN persisted-index planes sweep: build the signature-partitioned
index at several plane counts over a clustered synthetic corpus (the
realistic embedding shape) and measure build wall, probe wall, rows
scanned by the partition-pruned probe, and recall@10 vs exact.

Evidence for the planes_for() guidance (planes ~= log2(n/target_bucket)):
more planes => smaller buckets => cheaper probes at (slightly) lower
recall, recovered by multi-probe.

Usage: python tools/ann_planes_sweep.py [n_vectors] [dims]
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

    qv = [float(x) for x in centers[7] + 0.02 * rng.normal(size=dims)]
    exact = [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10).collect()]

    out = {"n": n, "dims": dims, "planes_for_1024": SIM.planes_for(n, 1024)}
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for planes in (8, 12, 16):
            path = os.path.join(tmp, f"idx{planes}")
            t0 = time.monotonic()
            SIM.write_lsh_index(emb, path, dims=dims, planes=planes)
            build = time.monotonic() - t0
            probes = SIM.probe_signatures(
                SIM.query_signature(qv, dims, planes), 1
            )
            scanned = (
                spark.read.parquet(path)
                .where(F.col("sig").isin(probes))
                .count()
            )
            t0 = time.monotonic()
            approx = [
                r["vec_id"]
                for r in SIM.lsh_topk_indexed(
                    spark, path, qv, k=10, multi_probe=1
                ).collect()
            ]
            probe_wall = time.monotonic() - t0
            results[f"planes{planes}"] = {
                "build_sec": round(build, 2),
                "probe_sec": round(probe_wall, 3),
                "rows_scanned": scanned,
                "scan_frac": round(scanned / n, 5),
                "recall_at_10": round(len(set(exact) & set(approx)) / 10, 2),
            }
    out["sweep"] = results
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
