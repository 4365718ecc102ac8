"""Deduplication operators for the training-data pipeline.

- exact dedup: fingerprint groupBy (functions.textstats.fingerprint)
- MinHash + LSH near-dup: shingle → K minhashes → band-bucket →
  bucket self-join. Hashing is md5-hex-min (md5 agrees bit-for-bit
  between Spark and DuckDB, and min over fixed-width lowercase hex ==
  min over the hash values), so the DuckDB oracle can mirror the whole
  pipeline exactly.
- SimHash: per-token md5 nibbles vote on 16 signature bits (a compact,
  cross-engine-reproducible variant of the classic 64-bit simhash).
- n-gram Jaccard verify: exact similarity on LSH candidate pairs only —
  the candidate set is LSH-bounded so the quadratic step never sees the
  full corpus (the scale-correct shape).

Everything is native explode/groupBy/join — no Python. At 100 TB the
heavy op is the band-bucket shuffle, which is K/r small fixed-width
strings per doc, not the documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawlerfull_spark.functions.textstats import fingerprint, tokens

DEFAULT_K = 12       # minhash functions
DEFAULT_BANDS = 4    # LSH bands (rows per band = K / BANDS)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per normalized-text fingerprint."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("kept_" + id_col), F.count("*").alias("n_dupes"))
    )


def shingles(text_col, n: int = 3):
    """n-token shingles over whitespace tokens (native higher-order fns)."""
    toks = tokens(F.lower(text_col))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(text_col, k: int = DEFAULT_K):
    """Array of K minhashes (md5-hex-min per salt)."""
    sh = shingles(text_col)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"|{j}"))))
            )
            for j in range(k)
        ]
    )


def lsh_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band_id, band_hash) — docs sharing any (band_id, band_hash)
    are near-dup candidates."""
    r = k // bands
    sig = minhash_signature(F.col(text_col), k)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.element_at(sig, b * r + i + 1) for i in range(r)]))
        for b in range(bands)
    ]
    wide = docs.select(
        F.col(id_col),
        *[c.alias(f"_b{b}") for b, c in enumerate(band_cols)],
    )
    stacked = wide.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), F.col(f"_b{b}").alias("band_hash"))
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    )
    return stacked.select(id_col, "band.band_id", "band.band_hash")


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band."""
    b = lsh_bands(docs, id_col, text_col, k, bands)
    left = b.select(
        F.col(id_col).alias("id_a"), "band_id", "band_hash"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), "band_id", "band_hash"
    )
    return (
        left.join(right, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only (verify stage)."""
    sets = docs.select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), n)).alias("sh")
    )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidate_pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash16(text_col):
    """16-bit simhash: each token's md5 first 4 hex nibbles vote ±1 on 16
    bits; the signature bit is the sign of the vote sum. Cross-engine
    reproducible (md5 + integer arithmetic only)."""
    toks = tokens(F.lower(text_col))
    hexd = F.lit("0123456789abcdef")

    def nibble(tok, pos):
        return F.instr(hexd, F.substring(F.md5(tok), pos + 1, 1)) - 1

    def vote_fn(nib: int, bit: int):
        def step(acc, t):
            return acc + F.when(
                (F.floor(nibble(t, nib) / F.lit(2 ** bit)) % 2) == 1, F.lit(1)
            ).otherwise(F.lit(-1))

        return step

    total = F.lit(0)
    for b in range(16):
        nib, bit = divmod(b, 4)
        # vote_b over tokens: +1 if the bit is set else -1
        vote = F.aggregate(toks, F.lit(0), vote_fn(nib, bit))
        total = total + F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0))
    return total
