"""Explicit StructType schemas for every engine table.

The reference enforces no schema anywhere (Mongo docs written with an
implicit shape, /root/reference/worker/src/db/storage.py:177-182); here
every table is declared once and enforced at write time.

``DOCUMENTS`` is the canonical interleaved text+media payload table from
BASELINE.json input_hint:
    documents(doc_id: string,
              spans: array<struct<kind, text, media_ref, offset>>)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN = StructType(
    [
        StructField("kind", StringType()),       # text | link | media | pagination
        StructField("text", StringType()),       # text content / anchor text; null for media
        StructField("media_ref", StringType()),  # absolute URL for link/media; null for text
        StructField("offset", IntegerType()),    # 0-based document-order index
    ]
)

# slim anchor projection stored alongside spans in the documents table:
# crawl consumers (cascade, frontier) read ONLY this column, so parquet
# column pruning skips decoding the prose text spans entirely
LINK_SPAN = StructType(
    [
        StructField("kind", StringType()),       # link | pagination
        StructField("media_ref", StringType()),  # absolute URL
        StructField("offset", IntegerType()),    # original span offset
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN)),
    ]
)

# fetched+parsed page (spans + provenance), produced by the fetch stage
PARSED_PAGE = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("domain", StringType()),
        StructField("depth", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("discovery_seq", LongType()),
        StructField("status", StringType()),     # ok | failed
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN)),
    ]
)

FRONTIER = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("domain", StringType()),
        StructField("depth", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("discovery_seq", LongType()),
        StructField("salt_bucket", IntegerType()),
        StructField("round", IntegerType()),
    ]
)

SEEN_EXACT = StructType(
    [
        StructField("url", StringType()),
        StructField("round", IntegerType()),
    ]
)

# The SCHEDULED table is FRONTIER + queue_pos (dense per-domain fetch
# order) + fetch_round. ``fetch_round`` is the round the slice was
# scheduled/fetched in — the ``round`` column is the frontier GENERATION,
# which differs for carried-over rows in budgeted mode. The derived-seen
# contract (catalog._seen_projection) reads fetch_round; Catalog.
# write_round stamps it for the scheduled table when a caller omits it.

SEEN_BLOOM = StructType(
    [
        StructField("bucket_id", IntegerType()),
        StructField("filter_bytes", BinaryType()),
        StructField("round", IntegerType()),
    ]
)

PRODUCTS = StructType(
    [
        StructField("task_id", StringType()),
        StructField("domain", StringType()),
        StructField("url", StringType()),
        StructField("parser", StringType()),
        StructField("depth", IntegerType()),
        StructField("round", IntegerType()),
    ]
)

LINEAGE = StructType(
    [
        StructField("task_id", StringType()),
        StructField("round", IntegerType()),
        StructField("frontier_size", LongType()),
        StructField("seen_cardinality", LongType()),
        StructField("fetched", LongType()),
        StructField("parsed", LongType()),
        StructField("products", LongType()),
        StructField("docs_deduped", LongType()),
        StructField("wall_ms", LongType()),
    ]
)

# synthetic-world tables (FIXTURES.md §2)
HOSTS = StructType(
    [
        StructField("host", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("zipf_rank", IntegerType()),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType()),
        StructField("disallow_prefixes", ArrayType(StringType())),
    ]
)
