"""Document deduplication operators for training-data pipelines.

All operators are DataFrame -> DataFrame, deterministic, and shuffle-aware:

- exact:     one groupBy on md5(text) (map-side combinable);
- minhash:   char/word shingles -> 64-perm signatures (Arrow numpy UDF) ->
             LSH bands -> bucket self-join -> signature-estimated jaccard
             filter -> connected components -> canonical doc per cluster;
- simhash:   64-bit simhash, bucketed by four 16-bit chunks (any pair with
             hamming distance <= 3 shares a chunk by pigeonhole);
- ngram jaccard: exact set jaccard via explode + join (SQL-expressible —
             serves as the DuckDB oracle form of near-dup detection).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduce_spark.spark.kg import (
    N_BANDS,
    N_HASHES,
    _MERSENNE,
    _PERM_A,
    _PERM_B,
    connected_components,
)
from deduce_spark.spark.parallel import fan_out


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Clusters of byte-identical texts: (canonical_id, n_dups, text_hash)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def select_representatives(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "canonical_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware cluster representatives: ``(canonical_id, rep_id,
    rep_score)`` — the member with the HIGHEST score wins (ties → the
    lowest doc id, so the choice is deterministic and degrades to the
    min-id convention when every score ties).

    Min-id canonicals (the minhash/semantic/exact dedup contract) keep
    an arbitrary member; a training pipeline wants to keep the BEST
    member of each near-dup cluster (longest, highest LM quality, …).
    ``clusters`` is any dedup output carrying (id, cluster); ``scores``
    is (id, score) — e.g. textstats tokens or lmscore ppl (negate
    costs so higher = better).

    NULL scores are excluded from candidacy (a scoreless member cannot
    be "best"; Spark's struct ordering would otherwise sort the NULL
    FIRST and crown it, while DuckDB sorts it last — a silent
    cross-engine divergence).  A cluster whose every member is
    scoreless is absent from the output; the caller falls back to the
    min-id canonical it already has.

    Scale shape: one equi-join on the doc id and one map-combinable
    ``min(struct(-score, id))`` per cluster — no window, no skew risk
    beyond the cluster-size caps the dedup ops already enforce."""
    joined = clusters.select(
        F.col(id_col).alias("doc_id"),
        F.col(cluster_col).alias("canonical_id"),
    ).join(
        scores.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("long").alias("score"),
        ).filter(F.col("score").isNotNull()),
        "doc_id",
    )
    best = joined.groupBy("canonical_id").agg(
        F.min(
            F.struct(
                (-F.col("score")).alias("neg_score"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("b")
    )
    return best.select(
        "canonical_id",
        F.col("b.doc_id").alias("rep_id"),
        (-F.col("b.neg_score")).cast("long").alias("rep_score"),
    )


def select_representatives_oracle_sql(
    clusters_sql: str,
    scores_sql: str,
    id_col: str = "doc_id",
    cluster_col: str = "canonical_id",
    score_col: str = "score",
) -> str:
    """DuckDB twin of :func:`select_representatives` (same
    min-of-struct precedence: highest score, then lowest id; same
    NULL-score exclusion)."""
    return f"""
        SELECT canonical_id,
               (b).doc_id AS rep_id,
               (-(b).neg_score)::BIGINT AS rep_score
        FROM (
            SELECT c.{cluster_col} AS canonical_id,
                   min(struct_pack(
                       neg_score := -CAST(s.{score_col} AS BIGINT),
                       doc_id := c.{id_col})) AS b
            FROM ({clusters_sql}) c
            JOIN ({scores_sql}) s ON c.{id_col} = s.{id_col}
            WHERE s.{score_col} IS NOT NULL
            GROUP BY c.{cluster_col}
        )
    """


def _word_shingles(
    text: str, n: int = 3, max_words: int | None = None
) -> np.ndarray:
    words = text.split()
    if max_words is not None:
        words = words[:max_words]
    if len(words) < n:
        joined = " ".join(words)
        return np.array([zlib.crc32(joined.encode("utf-8"))], dtype=np.uint64)
    return np.array(
        [
            zlib.crc32(" ".join(words[i : i + n]).encode("utf-8"))
            for i in range(len(words) - n + 1)
        ],
        dtype=np.uint64,
    )


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
)


def minhash_sig(text: str, shingle_words: int = 3) -> list[int]:
    """Per-document minhash signature (module-level so the golden-fixture
    generator replays the EXACT kernel outside Spark)."""
    sh = _word_shingles(text, shingle_words)
    v = (np.outer(_PERM_A, sh) + _PERM_B[:, None]) % _MERSENNE
    return [int(x) for x in v.min(axis=1)]


# Tile size for the vectorized permute: 64 x 4096 x 8B = 2 MB per
# temporary, so the multiply/add/mod working set stays cache-resident.
# The old 1M-shingle chunks streamed ~0.5 GB temporaries through DRAM,
# which collapses under concurrency (32 parallel workers measured 30x
# slower per doc than this tile — memory bandwidth, not ALU, was the
# wall).  Per-doc results are bit-identical for any tile size; a single
# document longer than the tile still forms one chunk.
_MAX_CHUNK_SHINGLES = 1 << 12


def _batch_minhash_sigs(
    texts: list[str],
    shingle_words: int = 3,
    max_doc_words: int | None = None,
) -> list[list[int]]:
    """Batch-vectorized minhash: one (N_HASHES, chunk_shingles) permute
    matrix + segmented min (np.minimum.reduceat) instead of a per-document
    outer product.  Bit-identical to ``minhash_sig`` (same arithmetic on
    the same values, only the loop structure changes) — pinned by test and
    by the golden fixtures.

    Documents are processed in chunks of at most ``_MAX_CHUNK_SHINGLES``
    total shingles so the permute matrix (and its arithmetic temporaries)
    stays bounded regardless of Arrow batch size × document length — a
    10k-row batch of 1k-word web documents would otherwise materialize a
    multi-GB matrix per worker.

    The bound is across documents, NOT within one: a single document
    larger than the cap still forms one chunk (the reduceat segment must
    cover the whole doc), so peak memory for a pathological single doc is
    ``64 × its_shingles × 8 B`` — ~0.5 GB per million shingles.
    ``max_doc_words`` closes that hole: each document is clamped to its
    first ``max_doc_words`` whitespace tokens BEFORE shingling, so one
    doc's shingles — and with it the permute matrix — are hard-bounded at
    ``64 × max_doc_words × 8 B`` no matter what the crawl feeds in (a
    multi-hundred-MB book-dump page signs on its prefix instead of
    blowing out the worker).  ``None`` keeps the exact full-document
    semantics (the golden fixtures' form)."""
    out: list[list[int]] = []
    chunk: list[np.ndarray] = []
    chunk_shingles = 0

    def flush():
        nonlocal chunk, chunk_shingles
        if not chunk:
            return
        lengths = np.array([len(a) for a in chunk])
        flat = np.concatenate(chunk)
        v = (np.outer(_PERM_A, flat) + _PERM_B[:, None]) % _MERSENNE
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        mins = np.minimum.reduceat(v, starts, axis=1)  # (N_HASHES, n_docs)
        out.extend([int(x) for x in mins[:, j]] for j in range(len(chunk)))
        chunk, chunk_shingles = [], 0

    for t in texts:
        sh = _word_shingles(t, shingle_words, max_doc_words)  # never empty
        if chunk_shingles + len(sh) > _MAX_CHUNK_SHINGLES and chunk:
            flush()
        chunk.append(sh)
        chunk_shingles += len(sh)
    flush()
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    max_doc_words: int | None = None,
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = [int(d) for d in batch[id_col]]
            sigs = _batch_minhash_sigs(
                list(batch[text_col]), shingle_words, max_doc_words
            )
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    # single-row-group inputs otherwise sign the whole corpus on ONE core
    return fan_out(df.select(id_col, text_col)).mapInPandas(
        run, schema=_SIG_SCHEMA
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_words: int = 3,
    max_bucket: int = 256,
    max_doc_words: int | None = None,
) -> DataFrame:
    """(doc_id, canonical_id) for every doc in a near-dup cluster.

    Buckets larger than ``max_bucket`` are dropped whole before the
    self-join (same cap strategy as ``kg.candidate_pairs``): one hot LSH
    bucket — template boilerplate at web scale — otherwise emits B²/2 join
    rows and stalls the stage.  Exact duplicates inside a dropped bucket are
    still caught by ``exact_dedup``; the cap trades a sliver of near-dup
    recall for a bounded join.

    ``max_doc_words`` (recommended at crawl scale, e.g. ``1_000_000``)
    clamps each document to its word prefix before shingling, bounding
    the signature worker's peak memory against pathological single
    documents — see :func:`_batch_minhash_sigs`."""
    sigs = minhash_signatures(
        df, text_col, id_col, shingle_words, max_doc_words
    ).cache()
    rows_per_band = N_HASHES // N_BANDS
    # cache the banded table: it feeds the hot-bucket count, the anti-join
    # and BOTH sides of the bucket self-join — without the cache each of
    # those stages re-evaluates (and re-codegens) the 16-way xxhash64
    # band projection, which dominates the cold-run wall
    banded_cached = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    ).cache()
    # materialize BOTH caches eagerly with one bounded action (the banded
    # job scans sigs exactly once, populating its cache on the way): the
    # downstream plan otherwise scans them from several concurrently
    # launched subtrees (hot-bucket count, self-join l/r, both verify
    # joins), each recomputing the whole Python signature stage and racing
    # to populate the same cache (the "Block rdd_N already exists"
    # warnings).  The operator is already eager (connected_components runs
    # actions), so this changes no contract.
    banded_cached.count()
    banded = banded_cached
    # map-combinable bucket-size cap: count buckets, keep only the OVER-cap
    # keys (few by construction: <= n/max_bucket, zero on healthy data) and
    # anti-join them away.  NOT a window keyed on the raw bucket — a window
    # materializes each hot bucket on one task (sort included) before
    # filtering, exactly the straggler the cap exists to prevent; and NOT a
    # semi-join against the huge under-cap key set — the over-cap side is
    # the broadcastable one.
    hot_buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
        .select("band", "band_key")
    )
    banded = banded.join(
        F.broadcast(hot_buckets), ["band", "band_key"], "left_anti"
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    # verify candidates with the signature-estimated jaccard
    est = (
        pairs.join(sigs.withColumnRenamed("doc_id", "a").withColumnRenamed("sig", "sig_a"), "a")
        .join(sigs.withColumnRenamed("doc_id", "b").withColumnRenamed("sig", "sig_b"), "b")
        .withColumn(
            "est_jaccard",
            # zip_with avoids arrays_zip's per-element struct allocation
            # (measured 6x faster on the kg.py verify stage)
            F.expr(
                "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),"
                " 0, (acc, v) -> acc + v)"
            )
            / F.lit(N_HASHES),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b")
    )
    comp = connected_components(est)
    # comp is materialized (driver union-find or checkpointed star rounds);
    # the returned frame depends only on it and the input scan, so the
    # intra-operator caches can be released instead of leaking per call
    sigs.unpersist(False)
    banded_cached.unpersist(False)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("surface_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("canonical_id")
        )
    )


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


# Cache-resident tile (see _MAX_CHUNK_SHINGLES): 4096 x 64 x 8B = 2 MB
# per temporary vs the old 512 MB — 20x faster per doc under 32-way
# worker concurrency (DRAM-bandwidth bound before).  Bit-identical for
# any tile size.
_MAX_CHUNK_WORDS = 1 << 12


def _batch_simhash(texts: list[str]) -> list[int]:
    """Batch-vectorized simhash: one (chunk_words, 64) bit matrix with
    segmented vote sums (np.add.reduceat) — bit-identical to ``simhash64``
    (same word hashes, same votes, same sign threshold), pinned by test
    and by the golden fixtures.  Chunked at ``_MAX_CHUNK_WORDS`` total
    words so the bit matrix stays bounded regardless of Arrow batch size
    × document length (same rationale as ``_batch_minhash_sigs``)."""
    out = np.zeros(len(texts), dtype=np.int64)

    def flush(idx: list[int], word_lists: list[list[str]]):
        if not idx:
            return
        flat = [w for words in word_lists for w in words]
        h1 = np.array(
            [zlib.crc32(w.encode("utf-8")) for w in flat], dtype=np.uint64
        )
        h2 = np.array(
            [zlib.crc32(w.encode("utf-8")[::-1]) ^ 0x9E3779B9 for w in flat],
            dtype=np.uint64,
        )
        h = (h1 << np.uint64(32)) | h2
        bits = ((h[:, None] >> _BIT_COLS) & np.uint64(1)).astype(np.int64)
        votes = 2 * bits - 1  # (chunk_words, 64)
        lengths = np.array([len(w) for w in word_lists])
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        v = np.add.reduceat(votes, starts, axis=0)  # (n_docs_in_chunk, 64)
        sims = ((v > 0).astype(np.uint64) << _BIT_COLS[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[idx] = sims.astype(np.int64)  # two's-complement reinterpret

    idx: list[int] = []
    word_lists: list[list[str]] = []
    n_words = 0
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue  # empty doc -> simhash 0 (matches simhash64)
        if n_words + len(words) > _MAX_CHUNK_WORDS and idx:
            flush(idx, word_lists)
            idx, word_lists, n_words = [], [], 0
        idx.append(i)
        word_lists.append(words)
        n_words += len(words)
    flush(idx, word_lists)
    return [int(x) for x in out]


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit simhash over word features (crc32-seeded, deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = [int(d) for d in batch[id_col]]
            hashes = _batch_simhash(list(batch[text_col]))
            yield pd.DataFrame({"doc_id": ids, "simhash": hashes})

    # single-row-group inputs otherwise hash the whole corpus on ONE core
    return fan_out(df.select(id_col, text_col)).mapInPandas(
        run, schema=_SIMHASH_SCHEMA
    )


_BIT_COLS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """Per-document 64-bit simhash as a signed long (module-level for the
    golden-fixture generator)."""
    words = text.split()
    if not words:
        return 0
    h1 = np.array(
        [zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64
    )
    # widen to 64 bits with a second independent crc
    h2 = np.array(
        [zlib.crc32(w.encode("utf-8")[::-1]) ^ 0x9E3779B9 for w in words],
        dtype=np.uint64,
    )
    h = (h1 << np.uint64(32)) | h2
    bits = ((h[:, None] >> _BIT_COLS) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    sim = int(((v > 0).astype(np.uint64) << _BIT_COLS).sum(dtype=np.uint64))
    return sim - (1 << 64) if sim >= (1 << 63) else sim


def simhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """(a, b, hamming) pairs with hamming(simhash) <= max_hamming.

    Pigeonhole bucketing by four 16-bit chunks; buckets above ``max_bucket``
    are dropped whole before the self-join (see ``minhash_dedup``) so a hot
    chunk value cannot go quadratic at scale."""
    # sigs feeds only the chunk explode (the simhash value rides along in
    # chunks), so the cache worth having is chunks, not sigs
    sigs = simhash_signatures(df, text_col, id_col)
    # cached EAGERLY for the same reason as minhash_dedup's banded table:
    # three downstream subtrees consume it (hot-chunk count, anti-join,
    # self-join l/r) and would otherwise concurrently recompute the whole
    # Python simhash stage, racing to populate the cache
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftrightunsigned(simhash, {16 * i}) & 65535")
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    ).cache()
    chunks.count()
    # map-combinable bucket-size cap (see minhash_dedup): anti-join the few
    # OVER-cap chunk values away; no window keyed on the raw bucket column
    hot_buckets = (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
        .select("chunk_idx", "chunk_val")
    )
    chunks = chunks.join(
        F.broadcast(hot_buckets), ["chunk_idx", "chunk_val"], "left_anti"
    )
    cand = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
    )
    # hamming filter BEFORE the distinct: the predicate is a cheap
    # map-side bit_count, so the dedup shuffle carries only qualifying
    # pairs instead of every candidate row (guide §2.3)
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram (word) jaccard similarity pairs — explode + join form,
    fully relational (this is the operator the DuckDB oracle replays)."""
    words = F.split(F.col(text_col), " ")
    gram_list = F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(
        F.col(id_col).alias("doc_id"), gram_list.alias("grams")
    ).filter(F.size("grams") > 0)
    sizes = grams.select("doc_id", F.size("grams").alias("n_grams"))
    exploded = grams.select("doc_id", F.explode("grams").alias("gram"))
    inter = (
        exploded.alias("l")
        .join(
            exploded.alias("r"),
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_grams", "size_a"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_grams", "size_b"), "b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "n_common", "jaccard")
    )


def jaccard_join_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_permille: int = 700,
    max_token_bucket: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join (word n-gram Jaccard >= threshold)
    via prefix filtering — the AllPairs/PPJoin candidate scheme, and the
    scale path for what :func:`ngram_jaccard_pairs` computes by joining
    EVERY shared gram occurrence (each hot gram there contributes a full
    B^2 candidate block; here hot grams never generate candidates at
    all).

    Prefix-filter lemma (per-set alpha): order all grams by a global
    total order — ascending corpus document-frequency, gram as
    tiebreak, so the RAREST grams come first.  If ``J(A,B) >= t`` then
    ``|A∩B| >= ceil(t·|A|)`` and ``>= ceil(t·|B|)``, and two sets whose
    intersection is that large must share a gram within their first
    ``l_X = |X| - ceil(t·|X|) + 1`` grams (if the smaller prefix-max
    u_A <= u_B, a shared gram <= u_A would sit in both prefixes, so all
    shared grams exceed u_A, leaving at most ``ceil(t|A|) - 1`` of
    them).  So joining only PREFIX grams finds every qualifying pair;
    exact verification then removes false candidates — the output is
    the exact >=-threshold pair set, and the rare-first order is purely
    a performance choice (hot grams land past every prefix, so the
    candidate join's per-token buckets stay naturally tiny — no cap
    needed for correctness; ``max_token_bucket`` optionally drops
    pathological buckets at a documented recall cost, default exact).

    All native DataFrame ops: two map-combinable aggregations (sizes,
    gram df), one bounded window (per-doc gram rank — partition size =
    grams per doc), the prefix self-join, and a two-step intersection
    count over candidate pairs only.  Integer threshold arithmetic
    (``inter * 1000 >= t_permille * union``) keeps Spark and the DuckDB
    oracle bit-agreed.
    """
    if not 1 <= threshold_permille <= 1000:
        raise ValueError(f"threshold_permille in [1,1000], got {threshold_permille}")
    words = F.split(F.col(text_col), " ")
    gram_list = F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        df.select(F.col(id_col).alias("doc_id"), gram_list.alias("grams"))
        .filter(F.size("grams") > 0)
        .select("doc_id", F.size("grams").alias("n_grams"),
                F.explode("grams").alias("g"))
    )
    gfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df_g"))
    if max_token_bucket is not None:
        gfreq = gfreq.filter(F.col("df_g") <= max_token_bucket)
        grams_j = grams.join(gfreq.select("g"), "g", "left_semi")
    else:
        grams_j = grams
    # per-doc rank in the global (df asc, gram asc) order; prefix length
    # l = n_grams - ceil(t * n_grams) + 1, ceil done in exact integers
    w_doc = Window.partitionBy("doc_id").orderBy(F.asc("df_g"), F.asc("g"))
    prefix = (
        grams_j.join(gfreq, "g")
        .withColumn("_pos", F.row_number().over(w_doc))
        .filter(
            F.col("_pos")
            <= F.col("n_grams")
            - F.expr(f"({threshold_permille} * n_grams + 999) DIV 1000")
            + 1
        )
        .select("doc_id", "g")
    )
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("a"), F.col("g").alias("g"))
    gb = grams.select(F.col("doc_id").alias("b"), F.col("g").alias("g"))
    inter = (
        cand.join(ga, "a")
        .join(gb, ["b", "g"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = grams.select("doc_id", "n_grams").distinct()
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"),
                         F.col("n_grams").alias("size_a")), "a")
        .join(
            sizes.select(F.col("doc_id").alias("b"),
                         F.col("n_grams").alias("size_b")), "b")
        .withColumn("union_sz", F.col("size_a") + F.col("size_b") - F.col("n_common"))
        .filter(
            F.col("n_common") * 1000
            >= F.lit(int(threshold_permille)) * F.col("union_sz")
        )
        .select(
            "a", "b", "n_common",
            F.expr("(1000 * n_common) DIV union_sz").cast("long")
            .alias("jacc_permille"),
        )
    )
