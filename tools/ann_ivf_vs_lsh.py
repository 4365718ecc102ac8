"""IVF-flat vs LSH ANN on the same clustered corpus + query panel:
recall@10, rows scanned (partition-pruned), and probe wall per probe
width. The two scale paths differ in how they carve the corpus —
data-independent random hyperplanes (LSH) vs a learned k-means coarse
quantizer (IVF) — so on clustered embeddings IVF's lists should track
cluster boundaries and buy recall with fewer scanned rows, at the cost
of a training pass at build time.

Usage: python tools/ann_ivf_vs_lsh.py [n_vectors] [dims] [n_queries]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="ivf-vs-lsh", master=f"local[{cpus}]", shuffle_partitions=cpus
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
    # three query families (VERDICT r5 item 4 — the r5 panel was only
    # perturbed cluster centers, IVF's best case by construction):
    #   center   — perturbed cluster centers (queries deep inside a list)
    #   boundary — midpoints of two random cluster centers (queries that
    #              sit between centroids, where single-list probing is
    #              weakest and the auto_nprobe default earns its keep)
    #   random   — uniform-random directions (no cluster affinity at all)
    q_centers = rng.integers(0, n_clusters, size=n_queries)
    pair_a = rng.integers(0, n_clusters, size=n_queries)
    pair_b = (pair_a + 1 + rng.integers(0, n_clusters - 1, size=n_queries)) % n_clusters
    families = {
        "center": [
            [float(x) for x in centers[c] + 0.02 * rng.normal(size=dims)]
            for c in q_centers
        ],
        "boundary": [
            [float(x) for x in 0.5 * (centers[a] + centers[b])]
            for a, b in zip(pair_a, pair_b)
        ],
        "random": [
            [float(x) for x in rng.normal(size=dims)] for _ in range(n_queries)
        ],
    }

    def exact_topk(queries):
        qmat = np.array(queries)
        qunit = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        cos_all = unit @ qunit.T
        return {
            qi: set(np.argsort(-cos_all[:, qi])[:10]) for qi in range(len(queries))
        }

    queries = families["center"]
    exact = exact_topk(queries)

    out = {"n": n, "dims": dims, "n_queries": n_queries}
    with tempfile.TemporaryDirectory() as tmp:
        # ---- LSH at the corpus-appropriate planes, rule probe radius ----
        pf = SIM.planes_for(n, 1024)
        mp = SIM.auto_multi_probe(pf)
        lsh_path = os.path.join(tmp, "lsh")
        t0 = time.monotonic()
        SIM.write_lsh_index(emb, lsh_path, dims=dims, planes=pf)
        lsh_build = time.monotonic() - t0
        hits = scanned = 0
        t0 = time.monotonic()
        for qi, qv in enumerate(queries):
            got = {
                r["vec_id"]
                for r in SIM.lsh_topk_indexed(spark, lsh_path, qv, k=10).collect()
            }
            hits += len(exact[qi] & got)
        lsh_probe = (time.monotonic() - t0) / n_queries
        sig_rows = emb.select(
            "vec_id", SIM.lsh_signature(F.col("embedding"), dims, pf).alias("sig")
        ).collect()
        buckets = defaultdict(int)
        for r in sig_rows:
            buckets[r["sig"]] += 1
        for qv in queries:
            probes = SIM.probe_signatures(SIM.query_signature(qv, dims, pf), mp)
            scanned += sum(buckets.get(s, 0) for s in probes)
        out["lsh"] = {
            "planes": pf,
            "multi_probe": mp,
            "build_sec": round(lsh_build, 2),
            "probe_sec_mean": round(lsh_probe, 3),
            "recall_at_10": round(hits / (10 * n_queries), 3),
            "scan_frac": round(scanned / n_queries / n, 5),
        }

        # ---- IVF at nlist ~ sqrt(n), nprobe sweep --------------------------
        ivf_path = os.path.join(tmp, "ivf")
        t0 = time.monotonic()
        SIM.write_ivf_index(emb, ivf_path, dims=dims)
        ivf_build = time.monotonic() - t0
        nlist = SIM.read_index_meta(ivf_path)["nlist"]
        members = defaultdict(int)
        for r in (
            spark.read.parquet(ivf_path).select("list_id").groupBy("list_id")
            .count().collect()
        ):
            members[r["list_id"]] = r["count"]
        auto = SIM.auto_nprobe(nlist)
        fam_cells = {}
        for fam, fam_queries in families.items():
            fam_exact = exact if fam == "center" else exact_topk(fam_queries)
            cells = {}
            for nprobe in sorted({1, 2, 4, 8, auto}):
                hits = scanned = 0
                t0 = time.monotonic()
                for qi, qv in enumerate(fam_queries):
                    got = {
                        r["vec_id"]
                        for r in SIM.ivf_topk_indexed(
                            spark, ivf_path, qv, k=10, nprobe=nprobe
                        ).collect()
                    }
                    hits += len(fam_exact[qi] & got)
                wall = (time.monotonic() - t0) / n_queries
                for qv in fam_queries:
                    lists = SIM.ivf_probe_lists(spark, ivf_path, qv, nprobe)
                    scanned += sum(members[l] for l in lists)
                cells[f"nprobe{nprobe}"] = {
                    "recall_at_10": round(hits / (10 * n_queries), 3),
                    "probe_sec_mean": round(wall, 3),
                    "scan_frac": round(scanned / n_queries / n, 5),
                }
            fam_cells[fam] = cells
        out["ivf"] = {
            "nlist": nlist,
            "auto_nprobe": auto,
            "build_sec": round(ivf_build, 2),
            "cells": fam_cells["center"],
            "families": fam_cells,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
