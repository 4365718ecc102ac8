"""ANN (planes × multi_probe) → recall sweep over a clustered synthetic
corpus (the realistic embedding shape), plus a real persisted-index cell
at the corpus-appropriate plane count.

Evidence for two documented defaults (VERDICT r4 item 7):
- ``planes_for()``: planes ≈ log2(n/target_bucket) — more planes =>
  smaller buckets => cheaper probes at lower single-bucket recall;
- ``auto_multi_probe()``: Hamming-1 probing covers 1+planes of the
  2^planes buckets, a SHRINKING fraction as planes grows, so the probe
  radius must grow with the plane count. The rule
  ``multi_probe = max(1, round(planes/8))`` is derived from this
  sweep's table (see BENCH/BASELINE.md).

Method note: recall cells are computed from the ENGINE's signatures
(``lsh_signature`` collected once per plane count) with the bucket
membership + exact-cosine-within-candidates replayed in numpy — the
identical semantics of ``lsh_topk_indexed`` without materializing a
2^20-directory partitioned index for a 10^5-vector corpus (the earlier
form did, and spent its wall re-listing 65k+ partition dirs per probe;
at production scale the bucket count TRACKS the corpus via
``planes_for`` so the on-disk index never has that shape). The
simulation is cross-checked against the real operator: one persisted
index is built at ``planes_for(n)`` and ``lsh_topk_indexed`` must
return exactly the simulated top-k for every panel query.

Usage: python tools/ann_planes_sweep.py [n_vectors] [dims] [n_queries]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webcrawlerfull_spark.operators import similarity as SIM  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402

PLANE_COUNTS = (8, 12, 16, 20)
MULTI_PROBES = (0, 1, 2, 3)


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
    unit = pts / np.linalg.norm(pts, axis=1, keepdims=True)
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
    qmat = np.array(queries)
    qunit = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    cos_all = unit @ qunit.T  # (n, n_queries)
    exact = {
        qi: list(np.argsort(-cos_all[:, qi])[:10]) for qi in range(n_queries)
    }

    out = {
        "n": n,
        "dims": dims,
        "n_queries": n_queries,
        "planes_for_1024": SIM.planes_for(n, 1024),
    }
    results: dict = {}
    for planes in PLANE_COUNTS:
        t0 = time.monotonic()
        sig_rows = emb.select(
            "vec_id", SIM.lsh_signature(F.col("embedding"), dims, planes).alias("sig")
        ).collect()
        sig_wall = time.monotonic() - t0
        buckets: dict[str, list[int]] = defaultdict(list)
        for r in sig_rows:
            buckets[r["sig"]].append(r["vec_id"])
        cell = {"signature_pass_sec": round(sig_wall, 2), "probes": {}}
        for mp in MULTI_PROBES:
            hits = 0
            scanned = 0
            for qi, qv in enumerate(queries):
                probes = SIM.probe_signatures(
                    SIM.query_signature(qv, dims, planes), mp
                )
                cand = [v for s in probes for v in buckets.get(s, ())]
                scanned += len(cand)
                if cand:
                    ca = np.array(cand)
                    top = ca[np.argsort(-cos_all[ca, qi])[:10]]
                    hits += len(set(exact[qi]) & set(top))
            cell["probes"][f"mp{mp}"] = {
                "recall_at_10": round(hits / (10 * n_queries), 3),
                "rows_scanned_mean": scanned // n_queries,
                "scan_frac": round(scanned / n_queries / n, 5),
                "buckets_probed": len(
                    SIM.probe_signatures("0" * planes, mp)
                ),
                "bucket_coverage": round(
                    len(SIM.probe_signatures("0" * planes, mp)) / 2**planes, 6
                ),
            }
        results[f"planes{planes}"] = cell
    out["sweep"] = results

    # the derived default rule, evaluated in-line so the JSON shows what
    # the rule would have picked and the recall it lands on
    out["rule_multi_probe"] = {
        f"planes{p}": {
            "mp": SIM.auto_multi_probe(p),
            "recall_at_10": results[f"planes{p}"]["probes"][
                f"mp{SIM.auto_multi_probe(p)}"
            ]["recall_at_10"],
        }
        for p in PLANE_COUNTS
    }

    # ---- real persisted-index cell at the corpus-appropriate planes ------
    # build wall + probe wall for the shape production would actually use
    # at this n, and an engine-vs-simulation equality cross-check.
    pf = SIM.planes_for(n, 1024)
    mp = SIM.auto_multi_probe(pf)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "idx")
        t0 = time.monotonic()
        SIM.write_lsh_index(emb, path, dims=dims, planes=pf)
        build = time.monotonic() - t0
        sig_rows = emb.select(
            "vec_id", SIM.lsh_signature(F.col("embedding"), dims, pf).alias("sig")
        ).collect()
        buckets = defaultdict(list)
        for r in sig_rows:
            buckets[r["sig"]].append(r["vec_id"])
        order_mismatches = 0
        set_mismatches = 0
        t0 = time.monotonic()
        for qi, qv in enumerate(queries):
            got = [
                r["vec_id"]
                for r in SIM.lsh_topk_indexed(spark, path, qv, k=10).collect()
            ]
            probes = SIM.probe_signatures(SIM.query_signature(qv, dims, pf), mp)
            cand = [v for s in probes for v in buckets.get(s, ())]
            ca = np.array(cand) if cand else np.array([], dtype=int)
            sim_top = list(ca[np.argsort(-cos_all[ca, qi])[:10]]) if cand else []
            if got != [int(x) for x in sim_top]:
                # rank swaps between near-tied cosines (JVM vs numpy
                # float summation order — observed 2e-7 apart) are
                # expected; different MEMBERSHIP would be a real bug
                order_mismatches += 1
            if set(got) != {int(x) for x in sim_top}:
                set_mismatches += 1
        probe_wall = (time.monotonic() - t0) / n_queries
        out["real_index"] = {
            "planes": pf,
            "multi_probe": mp,
            "build_sec": round(build, 2),
            "probe_sec_mean": round(probe_wall, 3),
            "engine_vs_sim_order_mismatches": order_mismatches,
            "engine_vs_sim_set_mismatches": set_mismatches,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
