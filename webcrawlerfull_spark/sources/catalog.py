"""Round-versioned table catalog — the engine's durable state layer.

Replaces the reference's three stores (Redis sets storage.py:106-137,
Mongo upsert-union storage.py:140-186, optional JSON/CSV files
storage.py:189-225) with ONE layout: a directory per table, a
subdirectory per round:

    {base}/{table}/round={k}/*.parquet

Writes are idempotent per (table, round) — mode('overwrite') of the
round directory — so re-running a round after a crash is safe. The
LINEAGE row for round k is written LAST and acts as the commit marker:
``max_committed_round()`` is the resume point (SURVEY.md §7 step 3).

Iceberg note: the north rule calls for Iceberg tables; the
iceberg-spark-runtime jar is not available in this sandbox (no network),
so this parquet layout is the documented stand-in — same semantics
(append-only snapshots keyed by round, atomic-enough commit marker,
time-travel by round). All writer/reader code is isolated here; pointing
it at an Iceberg catalog is a this-file-only change
(``writeTo(...).append()`` + a MERGE for S7).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class Catalog:
    TABLES = ("frontier", "seen", "scheduled", "documents", "products", "lineage", "mentions", "page_stats", "seen_bloom")

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base
        os.makedirs(base, exist_ok=True)

    def _dir(self, table: str, round_id: int | None = None) -> str:
        # dir key is "r=", not "round=": several tables carry a `round`
        # DATA column and Spark's partition discovery would collide
        d = os.path.join(self.base, table)
        if round_id is not None:
            d = os.path.join(d, f"r={round_id}")
        return d

    def write_round(self, df: DataFrame, table: str, round_id: int) -> None:
        df.write.mode("overwrite").parquet(self._dir(table, round_id))

    def has_round(self, table: str, round_id: int) -> bool:
        d = self._dir(table, round_id)
        return os.path.exists(os.path.join(d, "_SUCCESS"))

    def read_round(self, table: str, round_id: int) -> DataFrame:
        return self.spark.read.parquet(self._dir(table, round_id))

    def committed_rounds(self, table: str) -> list[int]:
        d = self._dir(table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("r=") and os.path.exists(
                os.path.join(d, name, "_SUCCESS")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def read_all(self, table: str, up_to_round: int | None = None) -> DataFrame | None:
        rounds = self.committed_rounds(table)
        if up_to_round is not None:
            rounds = [r for r in rounds if r <= up_to_round]
        if not rounds:
            return None
        paths = [self._dir(table, r) for r in rounds]
        df = self.spark.read.option("basePath", self._dir(table)).parquet(*paths)
        return df.drop("r")

    def max_committed_round(self) -> int | None:
        """Resume point: lineage is written last per round (commit marker)."""
        rounds = self.committed_rounds("lineage")
        return max(rounds) if rounds else None

    def drop_rounds_after(self, round_id: int) -> None:
        """Discard partial state from a crashed round (called on resume)."""
        for table in self.TABLES:
            for r in self.committed_rounds(table):
                if self._should_drop(table, r, round_id):
                    shutil.rmtree(self._dir(table, r), ignore_errors=True)

    @staticmethod
    def _should_drop(table: str, r: int, committed: int) -> bool:
        # frontier/round=k+1 is written BY round k, keep it; everything
        # else beyond the committed round is partial output
        if table == "frontier":
            return r > committed + 1
        return r > committed

    def destroy(self) -> None:
        shutil.rmtree(self.base, ignore_errors=True)
