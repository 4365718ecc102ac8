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

DEFAULT_K = 64       # minhash functions (production width; r1 used 12)
DEFAULT_BANDS = 16   # LSH bands (rows per band = K / BANDS)
HEXD = "0123456789abcdef"


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per normalized-text fingerprint."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("kept_" + id_col), F.count("*").alias("n_dupes"))
    )


def shingles(text_col, n: int = 3):
    """n-token shingles over whitespace tokens (native array exprs).

    Built by zipping the token array with its own shifted slices — NOT
    by indexing with ``element_at`` inside a ``transform`` lambda. A
    lambda body re-evaluates captured non-bound expressions once per
    ELEMENT, so the indexing form re-ran the whole-text regex split per
    shingle: quadratic in document length (measured ~1.3 s/doc on 15 KB
    pages vs ~50 ms for this form, identical output)."""
    toks = tokens(F.lower(text_col))
    win = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, win)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, win),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def minhash_signature(text_col, k: int = DEFAULT_K):
    """Array of K minhashes (md5-hex-min per salt) in ONE aggregate pass:
    per shingle, build the K salted hashes and fold with elementwise
    least(). K separate array_min(transform(...)) passes each materialize
    a full intermediate array — at K=64 that allocation dominated the
    stage (~30x slower than this fold). 'g' sorts above every hex char,
    so it is +inf for lowercase-hex min.

    Content-free documents (null/empty/whitespace text) get a NULL
    signature: they have no shingle evidence, and a shared placeholder
    signature would band every empty doc together and emit candidate
    pairs of unrelated near-empty documents (lsh_bands drops NULL
    signatures)."""
    sh = shingles(text_col)
    inf = F.array_repeat(F.lit("g"), k)
    folded = F.aggregate(
        sh,
        inf,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.md5(F.concat(s, F.lit(f"|{j}"))) for j in range(k)]),
            lambda a, b: F.least(a, b),
        ),
    )
    has_content = F.coalesce(F.trim(text_col) != "", F.lit(False))
    return F.when(has_content, folded)


# universal-hash modulus for the fast MinHash family: the Mersenne prime
# 2^31 - 1. Operands stay < 2^31, so a*h + b < 2^62 — never overflows a
# signed 64-bit long (Spark 4 runs ANSI mode: silent wraparound is not
# an option, arithmetic must provably fit).
_UH_PRIME = (1 << 31) - 1


def _uh_params(k: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_j, b_j) universal-hash coefficients — md5-derived
    like plane_weight in similarity.py, so the family is reproducible on
    any engine with no stored model."""
    import hashlib

    a, b = [], []
    for j in range(k):
        ha = hashlib.md5(f"mh-a-{j}".encode()).hexdigest()
        hb = hashlib.md5(f"mh-b-{j}".encode()).hexdigest()
        a.append(int(ha[:15], 16) % (_UH_PRIME - 1) + 1)   # 1 .. p-1
        b.append(int(hb[:15], 16) % _UH_PRIME)             # 0 .. p-1
    return a, b


def minhash_signature_fast(text_col, k: int = DEFAULT_K):
    """Array of K minhashes (longs) via ONE crc32 (zlib-compatible) per
    shingle + K universal-hash derivations h_j = (a_j*h + b_j) mod p —
    pure long arithmetic, no per-shingle string hashing or hex
    allocation.

    WHY THIS EXISTS: the md5 family above costs ~119 ms/doc-core on
    15 KB pages (k=64 ⇒ ~150k md5-of-concat evaluations per doc) —
    measured 375 s for 101k docs at 32 cores, which made the crawl's
    doc-dedup stage 40× the price of the round it ran in (BENCH §8).
    This family computes the same MinHash structure ~20-40× cheaper.
    It is a DIFFERENT hash family: band hashes are not comparable
    across families, so persisted dedup state carries a family marker
    (incremental_dedup_delta kind='meta') and the crawl driver refuses
    to resume across a family change. The md5 family stays the default
    for the DuckDB-oracled operators (the oracle replicates md5 in
    SQL).

    The base hash is crc32 (not xxhash64) DELIBERATELY: Spark's crc32
    and Python's zlib.crc32 are the same polynomial bit-for-bit, so the
    Arrow-batched numpy kernel below (dedup_signatures kernel=True —
    the crawl hot path) produces byte-identical band hashes to this
    expression form; xxhash64 has no stable Python twin. This
    expression form itself is NOT the hot path: higher-order
    aggregate/zip_with folds evaluate interpreted (no whole-stage
    codegen), measured ~260 s per 200k 15 KB docs at 32 cores
    regardless of hash function — the kernel does the same math in
    numpy at ~1/15 the cost (BENCH §8)."""
    sh = shingles(text_col)
    a, b = _uh_params(k)
    p = F.lit(_UH_PRIME).cast("long")
    # base hash once per shingle; the fold re-reads the array element,
    # not the crc32, when deriving the K streams
    hs = F.transform(
        sh, lambda s: F.pmod(F.crc32(F.encode(s, "UTF-8")), p)
    )
    inf = F.array_repeat(p, k)  # p > any value mod p
    folded = F.aggregate(
        hs,
        inf,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(a[j]).cast("long") * h + F.lit(b[j])) % p
                    for j in range(k)
                ]
            ),
            lambda x, y: F.least(x, y),
        ),
    )
    has_content = F.coalesce(F.trim(text_col) != "", F.lit(False))
    return F.when(has_content, folded)


# Java-regex \\s and String.trim are ASCII-only; Python re's \\s is
# unicode-aware. The kernel replicates the JVM semantics exactly so its
# fingerprints/band hashes match the expression forms byte-for-byte.
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def _signatures_kernel(
    docs: DataFrame, id_col: str, text_col: str, k: int, bands: int
) -> DataFrame:
    """Arrow-batched numpy implementation of dedup_signatures for the
    'fast' family — the crawl's doc-dedup hot path.

    WHY PYTHON HERE (the third sanctioned kernel, after the HTML parse
    mapInArrow and the numpy bloom kernel): the signature math is
    shingles × K fold work that Spark can only express as higher-order
    aggregate/zip_with lambdas, which evaluate INTERPRETED (outside
    whole-stage codegen) — measured 262 s for a 200k-doc round at 32
    cores, dominating the crawl. Here the same math is one zlib.crc32
    per shingle (identical to the JVM's crc32) plus a vectorized
    (n_shingles × K) universal-hash min in numpy. Byte-equality with
    the expression form is pytest-pinned."""
    import hashlib
    import re
    import zlib

    import numpy as np
    import pandas as pd

    a_l, b_l = _uh_params(k)
    r = k // bands
    ws_re = re.compile(_JAVA_WS)

    def gen(batches):
        A = np.array(a_l, dtype=np.uint64)
        B = np.array(b_l, dtype=np.uint64)
        P = np.uint64(_UH_PRIME)
        for pdf in batches:
            ids, fps, bandss = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = text if isinstance(text, str) else ""
                ids.append(did)
                fps.append(
                    hashlib.md5(ws_re.sub(" ", t).lower().encode()).hexdigest()
                )
                # Spark's trim() strips SPACES only (0x20) — mirror it
                # exactly, both for the has_content gate and the token
                # split (a leading tab yields an empty first token in
                # both engines; split keeps trailing empties like
                # Spark's limit=-1). ASCII-lowercase corpus assumed for
                # str.lower() == Spark lower() (synthetic worlds are).
                if t.strip(" ") == "":
                    bandss.append([])   # content-free: no band evidence
                    continue
                toks = ws_re.split(t.lower().strip(" "))
                if len(toks) >= 3:
                    sh = [
                        " ".join(toks[i : i + 3])
                        for i in range(len(toks) - 2)
                    ]
                else:
                    sh = [" ".join(toks)]
                hs = (
                    np.fromiter(
                        (zlib.crc32(s.encode()) for s in sh),
                        dtype=np.uint64,
                        count=len(sh),
                    )
                    % P
                )
                mins = ((hs[:, None] * A[None, :] + B[None, :]) % P).min(axis=0)
                bandss.append(
                    [
                        hashlib.md5(
                            "|".join(
                                str(int(mins[bb * r + i])) for i in range(r)
                            ).encode()
                        ).hexdigest()
                        for bb in range(bands)
                    ]
                )
            yield pd.DataFrame(
                {id_col: ids, "_fp": fps, "_bands": bandss}
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} string, _fp string, _bands array<string>"
    )


def lsh_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band_id, band_hash) — docs sharing any (band_id, band_hash)
    are near-dup candidates. Content-free docs (NULL signature) emit no
    bands. The signature is projected ONCE and the band hashes derive
    from the projected column, so the K-hash fold runs once per doc, not
    once per band."""
    r = k // bands
    with_sig = docs.select(
        F.col(id_col), minhash_signature(F.col(text_col), k).alias("_sig")
    ).where(F.col("_sig").isNotNull())
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.element_at(F.col("_sig"), b * r + i + 1) for i in range(r)]
            )
        )
        for b in range(bands)
    ]
    wide = with_sig.select(
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
    pre_dedup: bool = True,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band.

    Skew hardening (the two ways a band self-join goes quadratic):
    - ``pre_dedup``: exact duplicates share EVERY band, so a dup group of
      size g alone contributes g²/2 pairs per band. Dedup by normalized-
      text fingerprint first and band only the min-id representative —
      exact dups belong to ``exact_dedup`` upstream, not the LSH join.
    - ``max_bucket``: a degenerate band value (empty docs, boilerplate)
      can collect millions of members; buckets over the cap are EXCLUDED
      from pair generation (callers route oversized buckets to an exact
      verify/sampling path). The cap bounds any task's join work at
      max_bucket² per bucket regardless of corpus skew."""
    if pre_dedup:
        fps = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fp"))
        reps = fps.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        docs = docs.join(reps.select(id_col), id_col, "left_semi")
    b = lsh_bands(docs, id_col, text_col, k, bands)
    if max_bucket is not None:
        sizes = b.groupBy("band_id", "band_hash").agg(F.count("*").alias("_n"))
        b = (
            b.join(sizes, ["band_id", "band_hash"])
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
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


def dedup_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """The COMPACT cross-round dedup state for ``incremental_dedup``:
    (fingerprints(fp), band_set(band_id, band_hash)) — the MinHash
    analogue of the bloom seen-state. Carries NO text: a round's state is
    ~16 bytes (fp) + ``bands`` band hashes per kept doc, so round k+1
    dedups against it without rescanning any prior round's text."""
    fps = docs.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    if bands <= 0:
        # exact-only mode (bands=0): no near-dup state — the oracle-
        # replicable configuration (pure fingerprint accounting)
        b = docs.sparkSession.createDataFrame(
            [], "band_id int, band_hash string"
        )
    else:
        b = (
            lsh_bands(docs, id_col, text_col, k, bands)
            .select("band_id", "band_hash")
            .distinct()
        )
    return fps, b


def dedup_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    family: str = "md5",
    kernel: bool = False,
) -> DataFrame:
    """(id, _fp, _bands) — ONE scan of the text yielding everything the
    incremental dedup path needs: the exact-dedup fingerprint plus the
    LSH band-hash array (empty for content-free docs, whose NULL MinHash
    signature carries no shingle evidence; empty for bands=0 exact-only
    mode). The per-doc record is fixed-width (~16 B + 32 B × bands), so
    callers that consume it from several branches persist THIS instead
    of rescanning text.

    ``family`` picks the MinHash hash family: 'md5' (oracle-replicable,
    expensive — K md5s per shingle) or 'fast' (crc32 + universal
    hashing, ~20-40× cheaper; see minhash_signature_fast). Band hashes
    stay md5-hex strings either way (16 per doc — cheap), so the state
    schema is family-independent; the VALUES differ, hence the family
    marker on persisted state."""
    empty = F.array().cast("array<string>")
    if bands <= 0:
        return docs.select(
            F.col(id_col),
            fingerprint(F.col(text_col)).alias("_fp"),
            empty.alias("_bands"),
        )
    if family not in ("md5", "fast"):
        raise ValueError(f"unknown MinHash family {family!r}")
    if kernel:
        if family != "fast":
            raise ValueError("the numpy kernel implements the 'fast' family")
        return _signatures_kernel(docs, id_col, text_col, k, bands)
    sig_fn = minhash_signature if family == "md5" else minhash_signature_fast
    r = k // bands
    with_sig = docs.select(
        F.col(id_col),
        fingerprint(F.col(text_col)).alias("_fp"),
        sig_fn(F.col(text_col), k).alias("_sig"),
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.element_at(F.col("_sig"), b * r + i + 1).cast("string")
                    for i in range(r)
                ],
            )
        )
        for b in range(bands)
    ]
    return with_sig.select(
        F.col(id_col),
        "_fp",
        F.when(F.col("_sig").isNotNull(), F.array(*band_cols))
        .otherwise(empty)
        .alias("_bands"),
    )


def _label_against_state(
    sigs: DataFrame,
    state_fps: DataFrame | None,
    state_bands: DataFrame | None,
    id_col: str,
) -> DataFrame:
    """Shared incremental-dedup core over a ``dedup_signatures`` frame:
    adds ``_exact`` (fp in state, or a lower-id doc in this batch shares
    it — keep-first) and ``_near`` (≥1 band shared with the state) to
    each sig row. Hash-key joins only; text is never touched."""
    reps = sigs.groupBy("_fp").agg(F.min(id_col).alias("_rep"))
    labeled = sigs.join(reps, "_fp")
    if state_fps is not None:
        labeled = labeled.join(
            state_fps.select(
                F.col("fp").alias("_fp"), F.lit(True).alias("_in_state")
            ),
            "_fp",
            "left",
        )
    else:
        labeled = labeled.withColumn("_in_state", F.lit(None).cast("boolean"))
    is_exact = (F.col(id_col) != F.col("_rep")) | F.coalesce(
        "_in_state", F.lit(False)
    )
    labeled = labeled.withColumn("_exact", is_exact)
    if state_bands is not None:
        sb = labeled.where(~F.col("_exact")).select(
            F.col(id_col),
            F.posexplode("_bands").alias("band_id", "band_hash"),
        )
        near_ids = (
            sb.join(state_bands, ["band_id", "band_hash"], "left_semi")
            .select(F.col(id_col).alias("_nid"))
            .distinct()
            .withColumn("_near", F.lit(True))
        )
        labeled = labeled.join(
            near_ids, labeled[id_col] == F.col("_nid"), "left"
        ).drop("_nid")
    else:
        labeled = labeled.withColumn("_near", F.lit(None).cast("boolean"))
    return labeled


def _verdict_col():
    return (
        F.when(F.col("_exact"), F.lit("exact_dup"))
        .when(F.coalesce("_near", F.lit(False)), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("status")
    )


def incremental_dedup(
    docs: DataFrame,
    state_fps: DataFrame | None,
    state_bands: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Classify one round's NEW documents against the accumulated dedup
    state (from ``dedup_state`` over prior kept docs): returns
    (id, status) with status ∈ {exact_dup, near_dup, kept}:

    - ``exact_dup``: fingerprint already in the state, or a lower-id doc
      IN THIS BATCH shares the fingerprint (within-batch keep-first)
    - ``near_dup``: not an exact dup, but shares ≥1 MinHash-LSH band
      with the state (within-batch near-dups are the batch-mode
      ``minhash_candidate_pairs``'s job — this operator's contract is
      new-vs-prior)
    - ``kept``: neither — these docs' fp/bands join the next state

    Scale shape: everything is semi/left joins on fixed-width hash keys
    (fp md5, band md5) — the new round's text is scanned once for its
    own signatures; prior text is never touched. At 10^10 docs the state
    co-partitions by its hash key, exactly like the bloom bucket state
    for URLs."""
    sigs = dedup_signatures(docs, id_col, text_col, k, bands)
    labeled = _label_against_state(
        sigs, state_fps, state_bands if bands > 0 else None, id_col
    )
    return labeled.select(F.col(id_col), _verdict_col())


def split_dedup_state(state: DataFrame | None) -> tuple[DataFrame | None, DataFrame | None]:
    """Unstack an ``incremental_dedup_delta`` table (any number of round
    deltas unioned) into the (state_fps, state_bands) pair
    ``incremental_dedup`` consumes."""
    if state is None:
        return None, None
    return (
        state.where(F.col("kind") == "fp").select("fp"),
        state.where(F.col("kind") == "band").select("band_id", "band_hash"),
    )


def dedup_scheme(k: int, bands: int, family: str) -> str:
    """The persisted-state compatibility marker: band-hash values depend
    on (family, k, bands), so state written under one tuple must never
    be probed under another (silent near-dup misses). bands=0 has no
    band rows and a family-independent fingerprint."""
    if bands <= 0:
        return "dedup:exact-only:v1"
    return f"dedup:minhash-{family}:k={k}:b={bands}:v1"


def incremental_dedup_delta(
    docs: DataFrame,
    state: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    sigs: DataFrame | None = None,
    family: str = "md5",
) -> DataFrame:
    """One round's dedup output as a SINGLE stacked frame — the crawl
    driver's per-round doc-dedup write (one job, like the bloom delta):

    - ``kind='verdict'`` rows: (doc_id, status) for every input doc
      (``incremental_dedup`` semantics vs the accumulated state)
    - ``kind='fp'`` / ``kind='band'`` rows: the KEPT docs' fingerprints
      and LSH band hashes — the next round's state delta
    - one ``kind='meta'`` row: the dedup_scheme marker (family/k/bands)
      the crawl driver validates before probing persisted state

    Sentinels ('' / -1) fill the unused columns so the frame is
    NULL-free (stacking convention). Round deltas union into the full
    state; ``split_dedup_state`` unstacks for the next round.

    The three row kinds all derive from ONE ``dedup_signatures`` frame;
    the union references it from three branches, so callers should pass
    a PERSISTED ``sigs`` (the crawl driver does) — otherwise each branch
    re-scans the text for its MinHash. Scale shape: hash-key joins only,
    prior text never rescanned; the state rows per round are O(kept docs
    × bands), fixed-width."""
    state_fps, state_bands = split_dedup_state(state)
    if sigs is None:
        sigs = dedup_signatures(docs, id_col, text_col, k, bands, family)
    labeled = _label_against_state(
        sigs, state_fps, state_bands if bands > 0 else None, id_col
    )
    verdicts = labeled.select(F.col(id_col), _verdict_col())
    kept_sigs = labeled.where(
        ~F.col("_exact") & ~F.coalesce("_near", F.lit(False))
    )
    s_int = F.lit(-1).cast("int")
    v_rows = verdicts.select(
        F.lit("verdict").alias("kind"),
        F.col(id_col).alias("doc_id"),
        "status",
        F.lit("").alias("fp"),
        s_int.alias("band_id"),
        F.lit("").alias("band_hash"),
    )
    fp_rows = kept_sigs.select(F.col("_fp").alias("fp")).distinct().select(
        F.lit("fp").alias("kind"),
        F.lit("").alias("doc_id"),
        F.lit("").alias("status"),
        "fp",
        s_int.alias("band_id"),
        F.lit("").alias("band_hash"),
    )
    band_rows = (
        kept_sigs.select(F.posexplode("_bands").alias("band_id", "band_hash"))
        .distinct()
        .select(
            F.lit("band").alias("kind"),
            F.lit("").alias("doc_id"),
            F.lit("").alias("status"),
            F.lit("").alias("fp"),
            F.col("band_id").cast("int").alias("band_id"),
            "band_hash",
        )
    )
    # one meta row per delta: the hash-scheme marker the crawl driver
    # validates on resume (the bloom HASH_SCHEME pattern — probing band
    # hashes written by a different family/k/bands silently misses
    # every near-dup)
    spark = docs.sparkSession
    meta_row = spark.createDataFrame(
        [("meta", "", dedup_scheme(k, bands, family), "", -1, "")],
        "kind string, doc_id string, status string, fp string, "
        "band_id int, band_hash string",
    )
    return (
        v_rows.unionByName(fp_rows)
        .unionByName(band_rows)
        .unionByName(meta_row)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup candidate pairs — the final
    step of a dedup pipeline (a near-dup CLUSTER keeps one
    representative, not one survivor per pairwise edge). Returns
    (node, component) with component = min node id in the cluster.

    Iterative min-label propagation as a driver loop: each iteration
    joins labels across edges and takes the elementwise min — one
    shuffle per iteration, converging in O(diameter) rounds (near-dup
    clusters are shallow: boilerplate stars, chains of revisions —
    single digits). ``localCheckpoint`` truncates the growing lineage so
    iteration k does not replay 1..k-1. The loop exits as soon as an
    iteration changes no label; ``max_iter`` bounds pathological chains
    (a 10^10-node path graph is not a dedup workload)."""
    spark = pairs.sparkSession
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if nodes is None:
        nodes = edges.select(F.col("src").alias(node_col)).distinct()
    else:
        nodes = nodes.select(F.col(node_col))
    labels = nodes.select(
        F.col(node_col), F.col(node_col).alias("component")
    ).localCheckpoint()
    edges = edges.localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col(node_col).alias("src"),
                    F.col("component").alias("_nc"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias(node_col))
            .agg(F.min("_nc").alias("_nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, node_col, "left")
            .select(
                F.col(node_col),
                F.least(
                    F.col("component"), F.coalesce("_nmin", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("_nmin", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "node",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public algorithm): converges in O(log n) rounds
    INDEPENDENT of graph diameter, vs min-label propagation's
    O(diameter). Same output contract as ``connected_components``:
    (node, component) with component = min node id in the cluster.

    Per round over the undirected edge set E:
    - large-star: for each node u, connect every strictly-LARGER
      neighbor to m = min(Γ(u) ∪ {u})
    - small-star: direct edges large→small; for each u, connect every
      neighbor and u itself to m = min(N(u))
    Both keep the component's min reachable while halving star depth;
    fixpoint = the edge set stops changing (checked with one count +
    hash-sum aggregate per round, not a full diff join). A round is two
    shuffles — on an adversarial chain this is ~2·log2(n) shuffles
    total where propagation needs n.

    ``stats`` (optional dict) gets ``rounds`` filled in — the chain-
    graph convergence test asserts the log bound. Use this variant when
    near-dup graphs may be chain-shaped (e.g. drifting boilerplate
    revisions); ``connected_components`` remains the cheaper choice for
    shallow star-shaped dup clusters."""
    e = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    def _checksum(edges: DataFrame):
        # decimal sum: summing raw 64-bit hashes overflows long under
        # ANSI mode; decimal(38,0) is overflow-free to ~10^18 edges and
        # order-independent
        row = edges.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(edges: DataFrame) -> DataFrame:
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("_m")
        )
        return (
            sym.join(m, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _small_star(edges: DataFrame) -> DataFrame:
        d = edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ).distinct()
        m = d.groupBy("src").agg(F.min("dst").alias("_m"))
        j = d.join(m, "src")
        out = j.select(
            F.col("dst").alias("src"), F.col("_m").alias("dst")
        ).unionByName(j.select(F.col("src"), F.col("_m").alias("dst")))
        return out.where(F.col("src") != F.col("dst")).distinct()

    prev = _checksum(e)
    rounds = 0
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        rounds += 1
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint edges are stars (node -> component min); add the centers
    # and any isolated nodes
    labels = e.select(F.col("src").alias(node_col), F.col("dst").alias("component"))
    centers = e.select(F.col("dst").alias(node_col), F.col("dst").alias("component"))
    labels = labels.unionByName(centers).distinct()
    if nodes is not None:
        isolated = nodes.select(F.col(node_col)).join(
            labels.select(node_col), node_col, "left_anti"
        )
        labels = labels.unionByName(
            isolated.select(
                F.col(node_col), F.col(node_col).alias("component")
            )
        )
    return labels


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


def simhash_votes(text_col, bits: int = 64):
    """Per-bit vote sums for a ``bits``-wide simhash: each token's md5
    (computed ONCE per token, then reused for all bits) votes ±1 on bit b
    according to hex nibble b//4's bit b%4. One pass over the token array
    (aggregate + zip_with); returns array<int> of length ``bits``."""
    toks = tokens(F.lower(text_col))
    hashes = F.transform(toks, lambda t: F.md5(t))
    hexd = F.lit(HEXD)

    def bitvote(h, b: int):
        nib, bit = divmod(b, 4)
        nibble = F.instr(hexd, F.substring(h, nib + 1, 1)) - 1
        return F.when(
            (F.floor(nibble / F.lit(2 ** bit)) % 2) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, F.array(*[bitvote(h, b) for b in range(bits)]), lambda a, v: a + v
        ),
    )


def simhash_hex_from_votes(votes_col, bits: int = 64):
    """Hex-string signature from a materialized votes column: nibble n
    encodes bits 4n..4n+3 (bit 4n+j has weight 2^j). String form keeps
    the full 64 bits portable across engines (no signed-long games)."""
    hexchars = F.array(*[F.lit(c) for c in HEXD])
    chars = []
    for n in range(bits // 4):
        val = F.lit(0)
        for j in range(4):
            val = val + F.when(
                F.element_at(votes_col, 4 * n + j + 1) > 0, F.lit(2 ** j)
            ).otherwise(F.lit(0))
        chars.append(F.element_at(hexchars, val + 1))
    return F.concat(*chars)


def simhash64_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) with a 64-bit hex-string signature. Two-step select
    so the vote aggregate is evaluated once, not once per nibble."""
    with_votes = docs.select(
        F.col(id_col), simhash_votes(F.col(text_col)).alias("_votes")
    )
    return with_votes.select(
        id_col, simhash_hex_from_votes(F.col("_votes")).alias("simhash")
    )


def _nib(sig_col, n: int):
    return F.instr(F.lit(HEXD), F.substring(sig_col, n + 1, 1)) - 1


def simhash_hamming(sig_a, sig_b, bits: int = 64):
    """Exact Hamming distance between two hex-string signatures."""
    d = F.lit(0)
    for n in range(bits // 4):
        d = d + F.bit_count(_nib(sig_a, n).bitwiseXOR(_nib(sig_b, n)))
    return d


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    bands: int = 4,
    pre_dedup: bool = True,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by 64-bit simhash within a Hamming ball: candidate
    generation is BANDED (pigeonhole: distance ≤ bands-1 guarantees at
    least one of ``bands`` equal 16-bit slices — the classic
    permute-and-block shape, so the self-join is on band equality, never
    all-pairs), then exact Hamming verify on candidates only.

    Skew hardening — the same two quadratic failure modes
    ``minhash_candidate_pairs`` guards against apply here, and WORSE: an
    exact-dup group shares ALL ``bands`` band values, so g identical
    boilerplate docs alone emit g²/2 candidate pairs per band:
    - ``pre_dedup``: collapse exact duplicates to their min-id
      representative first (exact dups belong to ``exact_dedup``)
    - ``max_bucket``: band values whose bucket exceeds the cap are
      excluded from pair generation, bounding any task's join work at
      max_bucket² regardless of corpus skew (degenerate case: every
      empty doc simhashes to all-zero and shares every band)."""
    assert max_distance < bands, "pigeonhole needs max_distance < bands"
    if pre_dedup:
        fps = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fp"))
        reps = fps.groupBy("_fp").agg(F.min(id_col).alias(id_col))
        docs = docs.join(reps.select(id_col), id_col, "left_semi")
    sigs = simhash64_df(docs, id_col, text_col)
    width = (64 // bands) // 4  # hex chars per band
    stacked = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("simhash", b * width + 1, width).alias(
                            "band_val"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_id", "band.band_val")
    if max_bucket is not None:
        sizes = stacked.groupBy("band_id", "band_val").agg(
            F.count("*").alias("_n")
        )
        stacked = (
            stacked.join(sizes, ["band_id", "band_val"])
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    left = stacked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
        "band_id", "band_val",
    )
    right = stacked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
        "band_id", "band_val",
    )
    cands = (
        left.join(right, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", simhash_hamming(F.col("sig_a"), F.col("sig_b"))
        )
        .where(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
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
