"""Deduplication operators for training-data pipelines (north-star
extension mandate — SURVEY §2.5/§7 item 6).

Five flavors, all pure DataFrame compositions (no Python UDFs anywhere):

- **exact**: hash-groupBy on the raw text (or any column set).
- **n-gram Jaccard**: shingle → explode → self-join on shingle →
  per-pair intersection counts → Jaccard ≥ τ. Exact, O(Σ pairs sharing
  a shingle); a document-frequency cap drops stop-shingles so the join
  fan-out stays bounded at 100 TB.
- **MinHash + LSH**: k hash functions (xxhash64 with per-function seed)
  → signature → banded buckets → candidate pairs only within a bucket →
  exact-Jaccard verify. The candidate join replaces the O(n²) pair space
  with O(collisions); this is THE scale path.
- **SimHash**: 64-bit signature via per-bit ±1 vote aggregation over
  token hashes; near-dup = Hamming distance ≤ d, candidates via 16-bit
  chunk equality (pigeonhole: d ≤ 3 ⇒ one of four chunks equal).
- **Embedding cosine**: see operators/similarity.py for the pair path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import exploded_shingles, shingle_column


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact duplicate groups over ``cols``: keeper = min(id), group size.

    One hash-shuffle on the (hashed) dedup key — at scale, group by
    md5/xxhash of the content instead of the content itself so the
    shuffle carries 16 bytes per row, not the document.
    """
    key = F.md5(F.concat_ws("\u001f", *[F.col(c) for c in cols]))
    return (
        df.select(F.col(id_col), key.alias("dedup_key"))
        .groupBy("dedup_key")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return exploded_shingles(df, id_col, text_col, n)


def _pair_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_df: float | None = None,
) -> DataFrame:
    """Shared core of the exact n-gram pair operators: one
    ``(id_1 < id_2, n_inter, n_1, n_2)`` row per document pair sharing at
    least one (optionally df-capped) hashed shingle."""
    # join/shuffle on the 8-byte shingle hash, not the shingle string —
    # same counts (64-bit collisions are ~1e-11 at any realistic corpus
    # vocabulary), a fraction of the shuffle bytes
    sh = _shingle_table(df, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("sh")
    )
    # the hashed shingle table is consumed up to 4× (df-cap pass, both
    # sides of the self-join, per-doc sizes); persisting the 16-byte
    # (id, hash) rows — NOT the documents — avoids recomputing the
    # shingle explode each time. MEMORY_AND_DISK spills gracefully at
    # scale; Spark's ContextCleaner drops the blocks once the plan is
    # unreferenced.
    from pyspark.storagelevel import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if max_df is not None:
        # stop-shingle cap computed on the HASHED table: the df groupBy
        # shuffles 8-byte keys (partial-aggregated map-side), not shingle
        # strings, and the hot set broadcasts into a left_anti.
        # The doc count for the cap comes from the PERSISTED shingle
        # table (docs that actually have >= n tokens), not df.count() —
        # one fewer full corpus pass; the first action over `sh` also
        # materializes the cache every later stage reuses.
        cap = int(sh.select("_id").distinct().count() * max_df)
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > cap)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_1"), F.col("n_sh").alias("n_1"))
    sb = sizes.select(F.col("_id").alias("id_2"), F.col("n_sh").alias("n_2"))
    return inter.join(sa, "id_1").join(sb, "id_2")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (id_1, id_2, jaccard ≥ τ)."""
    return (
        _pair_intersections(df, id_col, text_col, n, max_df)
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_1") + F.col("n_2") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df: float | None = None,
) -> DataFrame:
    """Directional containment pairs: ``(id_sub, id_super, containment)``
    with containment = |A∩B| / |A| ≥ τ — the quote/subset detector
    symmetric Jaccard dilutes away (a paragraph fully copied into a long
    document scores tiny Jaccard but containment 1.0; Broder's original
    resemblance-vs-containment distinction). Each unordered intersection
    row fans into the two directional checks, so the cost envelope is
    identical to :func:`ngram_jaccard_pairs`."""
    pairs = _pair_intersections(df, id_col, text_col, n, max_df)
    d1 = pairs.select(
        F.col("id_1").alias("id_sub"),
        F.col("id_2").alias("id_super"),
        (F.col("n_inter") / F.col("n_1")).alias("containment"),
    )
    d2 = pairs.select(
        F.col("id_2").alias("id_sub"),
        F.col("id_1").alias("id_super"),
        (F.col("n_inter") / F.col("n_2")).alias("containment"),
    )
    return d1.unionByName(d2).where(F.col("containment") >= threshold)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 64
) -> DataFrame:
    """k-permutation MinHash signature per document (array<long>).

    The shingle string is hashed ONCE (xxhash64 → 8 bytes); the k
    per-permutation hashes re-hash that fixed-width value with the
    permutation index as seed — k× cheaper than hashing the string k
    times, same min-wise independence (xxhash64 seeded by i acts as the
    i-th permutation)."""
    sh = _shingle_table(df, id_col, text_col, n).select(
        "_id", F.xxhash64("shingle").alias("h0")
    )
    mins = sh.groupBy("_id").agg(
        *[
            F.min(F.xxhash64(F.col("h0"), F.lit(i))).alias(f"h{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"h{i}") for i in range(k)]).alias("signature"),
    )


def minhash_band_buckets(
    sig: DataFrame, id_col: str, k: int = 64, bands: int = 16
) -> DataFrame:
    """Banded LSH buckets from a signature table: one ``(_id, band,
    bucket)`` row per band, ``bucket`` = xxhash64 of that band's ``k/bands``
    signature slots. This is the unit an INDEX stores: the bucket table is
    upsert-maintained per ingest batch, so steady-state dedup hashes only
    the new batch and equi-joins it against the stored buckets."""
    r = k // bands
    return sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[F.element_at("signature", band * r + j + 1) for j in range(r)]
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs.

    signature → ``bands`` buckets of ``k/bands`` rows → docs colliding in
    any bucket become candidates → (optionally) exact-Jaccard verify.
    P(candidate) = 1-(1-j^r)^b — with k=64, b=16, r=4 a j=0.8 pair is
    caught with p≈0.9996 while j=0.3 pairs stay below 0.13.
    """
    sig = minhash_signatures(df, id_col, text_col, n, k)
    buckets = minhash_band_buckets(sig, id_col, k, bands)
    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .distinct()
    )
    if not verify:
        return candidates
    return exact_jaccard_verify(candidates, df, id_col, text_col, n, threshold)


def exact_jaccard_verify(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    restrict: bool = False,
) -> DataFrame:
    """Exact-Jaccard verification of ``(id_1, id_2)`` candidate pairs:
    join each pair to its two (already distinct) shingle arrays and
    compute Jaccard with ``array_intersect`` — O(candidates), never the
    full pair space.

    ``restrict=True`` semi-joins ``docs`` down to the ids that actually
    appear in a candidate pair before shingling — right when candidates
    touch a small slice of the corpus (the incremental-batch path), wrong
    for whole-corpus self-dedup where most docs are candidates anyway and
    the extra shuffle buys nothing."""
    if restrict:
        ids = (
            candidates.select(F.col("id_1").alias(id_col))
            .unionByName(candidates.select(F.col("id_2").alias(id_col)))
            .distinct()
        )
        docs = docs.join(ids, id_col, "left_semi")
    arrays = shingle_column(docs, text_col, "_s", n).select(
        F.col(id_col).alias("_aid"), "_s"
    )
    return (
        candidates.join(
            arrays.select(F.col("_aid").alias("id_1"), F.col("_s").alias("_s1")),
            "id_1",
        )
        .join(
            arrays.select(F.col("_aid").alias("id_2"), F.col("_s").alias("_s2")),
            "id_2",
        )
        .withColumn("_n_inter", F.size(F.array_intersect("_s1", "_s2")))
        .withColumn(
            "jaccard",
            F.col("_n_inter")
            / (F.size("_s1") + F.size("_s2") - F.col("_n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def incremental_lsh_pairs(
    index_buckets: DataFrame,
    batch: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against an already-indexed corpus —
    the steady-state shape of corpus dedup at 100 TB: the corpus is never
    re-shingled, re-hashed, or re-paired; only the day's batch is.

    ``index_buckets`` is the stored ``(_id, band, bucket)`` table built by
    :func:`minhash_band_buckets` over previous batches (persisted as an
    engine Table and upsert-maintained per ingest — O(batch) maintenance).
    The batch is signatured once, its buckets equi-join the index (plus
    themselves, for intra-batch dups), and only colliding pairs are
    exact-Jaccard verified against the texts of the ids involved
    (``restrict=True`` semi-join — the corpus text table is touched only
    for actual collision partners). Returns ``(id_1, id_2, jaccard)``
    where at least one side is a batch doc.
    """
    new_buckets = minhash_band_buckets(
        minhash_signatures(batch, id_col, text_col, n, k), id_col, k, bands
    )
    others = index_buckets.unionByName(new_buckets)
    a, b = new_buckets.alias("a"), others.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least("a._id", "b._id").alias("id_1"),
            F.greatest("a._id", "b._id").alias("id_2"),
        )
        .distinct()
    )
    return exact_jaccard_verify(
        candidates, docs, id_col, text_col, n, threshold, restrict=True
    )


def portable_token_hash(col: Column) -> Column:
    """60-bit token hash from the first 15 hex chars of md5.

    md5 is implemented identically in every engine, so a DuckDB/Trino/
    Postgres oracle can recompute the exact same hash (unlike xxhash64,
    whose seeding is Spark-specific). Used by the driver-gated simhash
    query so the oracle can rebuild signatures from scratch.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    nbits: int = 64,
    token_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """``nbits``-bit SimHash per document from token hashes (pure
    aggregation: per-bit ±1 vote sums in a single pass).

    ``token_hash`` defaults to xxhash64 (fast JVM path, 64 bits); pass
    :func:`portable_token_hash` (60 bits) for cross-engine verification.
    """
    from .text import tokens

    hash_fn = token_hash if token_hash is not None else F.xxhash64
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", hash_fn(F.col("tok")))
    votes = tok.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{bit}")
            for bit in range(nbits)
        ]
    )
    sim = None
    for bit in range(nbits):
        term = F.when(F.col(f"b{bit}") >= 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim.bitwiseOR(term)
    return votes.select(F.col("_id").alias(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    blocks: int = 6,
    bucket_cap: int | None = None,
    nbits: int = 64,
    token_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ d.

    Candidates via Manku-style multi-block banding (WWW'07 simhash paper,
    public algorithm): split the 64-bit signature into ``blocks`` segments;
    Hamming ≤ d means at most d segments differ, so at least ``blocks - d``
    segments are equal — joining on every (blocks-d)-subset of segments is
    a COMPLETE candidate filter. Each join key hashes ~(blocks-d)/blocks of
    the signature (≈32 bits for d=3, blocks=6), so the bucket space is
    ~2^32 — bucket width stays O(1) as the corpus grows, unlike single
    16-bit-chunk equality (2^16 buckets go quadratic past ~10M docs).

    All C(blocks, blocks-d) subset keys explode into one (id, bucket)
    table and ONE self-join — the LSH-banding shape — then exact popcount
    verify on the candidate set only.

    ``bucket_cap``: optionally drop buckets wider than this many docs.
    A wide bucket means a large cluster of near-identical documents —
    cheaper to collapse via exact_dedup first; the cap bounds candidate
    fan-out to O(n · cap) at the cost of recall inside dropped buckets.
    """
    from itertools import combinations

    # pigeonhole needs at least max_hamming+1 blocks (so ≥1 block is
    # guaranteed equal); auto-widen for permissive thresholds — keys get
    # narrower (nbits/(d+1) bits), which trades bucket selectivity for
    # completeness, the inherent simhash-banding tradeoff at high d
    blocks = max(blocks, max_hamming + 1)
    t = blocks - max_hamming
    sig = simhash(df, id_col, text_col, nbits=nbits, token_hash=token_hash).select(
        F.col(id_col).alias("_id"), "simhash"
    )
    # per-block extraction: widths as even as possible (e.g. 11,11,11,11,10,10)
    base, extra = divmod(nbits, blocks)
    seg_cols, offset = [], 0
    for i in range(blocks):
        width = base + (1 if i < extra else 0)
        mask = (1 << width) - 1
        seg_cols.append(
            F.shiftrightunsigned("simhash", offset).bitwiseAND(F.lit(mask)).alias(f"b{i}")
        )
        offset += width
    sig = sig.select("_id", "simhash", *seg_cols)
    # one bucket key per (blocks-d)-subset; the subset index seeds the hash
    # so identical segment values in different subsets never collide
    keys = F.array(
        *[
            F.xxhash64(F.lit(ci), *[F.col(f"b{i}") for i in combo]).alias("k")
            for ci, combo in enumerate(combinations(range(blocks), t))
        ]
    )
    buckets = sig.select(
        "_id", "simhash", F.explode(keys).alias("bucket")
    )
    if bucket_cap is not None:
        wide = (
            buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("w"))
            .where(F.col("w") > bucket_cap)
            .select("bucket")
        )
        buckets = buckets.join(F.broadcast(wide), "bucket", "left_anti")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_1"),
            F.col("b._id").alias("id_2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id1: str = "id_1",
    id2: str = "id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Collapse near-dup PAIRS into duplicate GROUPS: (id, component)
    where component = min id reachable through any chain of pairs — the
    step that turns pairwise dedup output into per-document keep/drop
    decisions.

    Iterative min-label propagation (the standard large-graph CC shape:
    alternate join-with-neighbors / take-min until fixpoint). Each round
    is one shuffle join + aggregate; rounds needed = component diameter,
    which for near-dup clusters is tiny (dup groups are near-cliques).
    ``max_iter`` bounds the loop; convergence is checked with a count of
    changed labels per round (an O(1)-result driver action, not a
    collect of the data).
    """
    e = pairs.select(F.col(id1).alias("a"), F.col(id2).alias("b"))
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    from pyspark.storagelevel import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy(F.col("a").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["id2"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", "component")


def contamination_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose n-gram
    overlap with an eval/benchmark document exceeds ``threshold``
    (fraction of the BENCHMARK's distinct n-grams found in the corpus
    doc — the standard decontamination direction: a long training doc
    that swallows a short eval item must score ~1 regardless of the
    training doc's own length).

    Scale shape: the benchmark side is small by definition → its
    exploded, hashed shingle table broadcasts; the corpus explodes
    map-side and equi-joins on an 8-byte xxhash64 key (the shuffle-free
    broadcast join carries 16 bytes/row, never document text); the
    per-(corpus,bench) match count is a partial-aggregatable groupBy.
    No self-joins, no cartesian products — cost is O(corpus n-grams).
    """
    c_sh = exploded_shingles(
        corpus, corpus_id, text_col, n, id_out="corpus_id", out="_g"
    ).select("corpus_id", F.xxhash64("_g").alias("_h"))
    b_sh = exploded_shingles(
        bench, bench_id, text_col, n, id_out="bench_id", out="_g"
    ).select("bench_id", F.xxhash64("_g").alias("_h"))
    bench_sizes = b_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    hits = (
        c_sh.join(F.broadcast(b_sh), "_h")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return (
        hits.join(F.broadcast(bench_sizes), "bench_id")
        .withColumn(
            "overlap",
            F.round(
                F.col("shared_ngrams").cast("double") / F.col("bench_ngrams"), 6
            ),
        )
        .where(F.col("overlap") >= threshold)
        .select("corpus_id", "bench_id", "shared_ngrams", "bench_ngrams", "overlap")
    )


def _span_table(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(_id, _h) rows: one per distinct ``window``-token rolling span,
    hashed to 8 bytes. Token array staged behind a projection (see
    text.shingle_column: inlining the split re-evaluates it per slice,
    O(tokens²) per row)."""
    w = F.col("__tok")
    spans = F.when(
        F.size(w) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - window),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, window)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.withColumn("__tok", F.split(F.col(text_col), " "))
        .select(F.col(id_col).alias("_id"), F.explode(spans).alias("_span"))
        .select("_id", F.xxhash64("_span").alias("_h"))
    )


def contamination_substring(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_shared: int = 1,
) -> DataFrame:
    """Exact-substring decontamination (the Lee et al. 2022 shape,
    cross-table): flag training documents sharing any verbatim
    ``window``-token span with an eval/benchmark document — catches the
    copied-question case that n-gram overlap ratios dilute away in long
    training docs. Same distributed shape as
    :func:`substring_window_pairs`: rolling span hashes exploded on both
    sides, one equi-join on the 8-byte hash (the bench side is small —
    AQE broadcasts it). Returns (corpus_id, bench_id, shared_windows).
    """
    c = _span_table(corpus, corpus_id, text_col, window)
    b = _span_table(bench, bench_id, text_col, window)
    return (
        c.alias("c")
        .join(b.alias("b"), F.col("c._h") == F.col("b._h"))
        .groupBy(
            F.col("c._id").alias("corpus_id"), F.col("b._id").alias("bench_id")
        )
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .where(F.col("shared_windows") >= min_shared)
    )


def contamination_index_build(
    bench: DataFrame,
    index_table,
    bench_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> None:
    """Hash the eval/benchmark set ONCE into a PERSISTED n-gram index —
    the steady-state evolution of :func:`contamination_pairs`, the same
    batch-vs-index shape :func:`incremental_lsh_pairs` gives MinHash
    dedup and ``semantic_prune_incremental`` gives SemDeDup: the
    recurring corpus pipeline should not rehash the (immutable) eval
    set on every batch.

    ``index_table`` is an engine ``Table`` keyed by ``_k`` =
    ``"<xxhash64(ngram)>:<bench_id>"`` (precombine ``_h``) with columns
    ``(_k, _h, bench_id)`` — one row per distinct (eval n-gram, eval
    doc). Bounded by the benchmark's n-gram count, NOT the corpus.
    Upsert-maintained: growing the benchmark later is another call
    (idempotent — re-inserting the same n-grams replaces byte-equal
    rows), and the index is ordinary table state (snapshot/time-travel/
    clean all apply)."""
    b_sh = (
        exploded_shingles(
            bench, bench_id, text_col, n, id_out="bench_id", out="_g"
        )
        .select("bench_id", F.xxhash64("_g").alias("_h"))
        .select(
            F.concat_ws(":", F.col("_h"), F.col("bench_id")).alias("_k"),
            "_h",
            "bench_id",
        )
    )
    index_table.upsert(b_sh)


def contamination_check_incremental(
    batch: DataFrame,
    index_table,
    corpus_id: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Flag a NEW corpus batch against the PERSISTED eval-set index
    (:func:`contamination_index_build`): the batch's n-grams hash
    map-side and equi-join the stored 8-byte hashes — O(batch) work per
    batch, with the eval set never re-tokenized and the corpus never
    rescanned (steady state is independent of corpus size). Same
    output shape and semantics as :func:`contamination_pairs`:
    ``(corpus_id, bench_id, shared_ngrams, bench_ngrams, overlap)``
    with overlap = fraction of the BENCHMARK's distinct n-grams found
    in the corpus doc. ``bench_ngrams`` comes from the index itself
    (per-doc row count), so no side lookup table is maintained. The
    index side is bounded by the benchmark — no broadcast hint; AQE
    broadcasts it at runtime when it is genuinely small."""
    idx = index_table.snapshot().select("_h", "bench_id")
    bench_sizes = idx.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    c_sh = exploded_shingles(
        batch, corpus_id, text_col, n, id_out="corpus_id", out="_g"
    ).select("corpus_id", F.xxhash64("_g").alias("_h"))
    hits = (
        c_sh.join(idx, "_h")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
    return (
        hits.join(bench_sizes, "bench_id")
        .withColumn(
            "overlap",
            F.round(
                F.col("shared_ngrams").cast("double") / F.col("bench_ngrams"),
                6,
            ),
        )
        .where(F.col("overlap") >= threshold)
        .select(
            "corpus_id", "bench_id", "shared_ngrams", "bench_ngrams", "overlap"
        )
    )


def contamination_substring_index_build(
    bench: DataFrame,
    index_table,
    bench_id: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> None:
    """Exact-substring flavor of :func:`contamination_index_build`:
    persist the eval set's rolling ``window``-token span hashes ONCE
    into an engine Table (same ``_k = "<hash>:<bench_id>"`` key shape),
    so the recurring corpus pipeline checks each batch for verbatim
    copied spans without re-tokenizing the benchmark. Bounded by the
    benchmark's span count; upsert-maintained and idempotent."""
    b = _span_table(bench, bench_id, text_col, window)
    index_table.upsert(
        b.select(
            F.concat_ws(":", F.col("_h"), F.col("_id")).alias("_k"),
            "_h",
            F.col("_id").alias("bench_id"),
        )
    )


def contamination_substring_check_incremental(
    batch: DataFrame,
    index_table,
    corpus_id: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_shared: int = 1,
) -> DataFrame:
    """Flag a NEW corpus batch against the persisted span index
    (:func:`contamination_substring_index_build`): the batch's rolling
    span hashes equi-join the stored 8-byte hashes — O(batch) per
    batch, the Lee-et-al. copied-question check at steady-state cost.
    Same output shape as :func:`contamination_substring`:
    ``(corpus_id, bench_id, shared_windows)``."""
    idx = index_table.snapshot().select("_h", "bench_id")
    c = _span_table(batch, corpus_id, text_col, window)
    return (
        c.join(idx, "_h")
        .groupBy(F.col("_id").alias("corpus_id"), "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .where(F.col("shared_windows") >= min_shared)
    )


def substring_window_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_shared: int = 1,
) -> DataFrame:
    """Exact-substring duplication candidates (the scalable shape of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": documents sharing any verbatim ``window``-token span are
    near-dups even when their overall Jaccard is low — the case shingle
    dedup misses for long docs sharing one copied paragraph).

    Suffix arrays don't distribute; the Spark-native equivalent is a
    rolling token window: every ``window``-token span, hashed to 8
    bytes, exploded, and equi-joined — docs sharing >= ``min_shared``
    distinct spans pair up. One shuffle on the span hash; fan-out is
    bounded because a verbatim 20-token span shared by many documents
    IS the boilerplate signal we're hunting. Returns (id_1, id_2,
    shared_windows).
    """
    sp = _span_table(df, id_col, text_col, window)
    a, b = sp.alias("a"), sp.alias("b")
    return (
        a.join(b, (F.col("a._h") == F.col("b._h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .where(F.col("shared_windows") >= min_shared)
    )


def keep_representative(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Apply pairwise near-dup decisions to the corpus: collapse pairs
    into components, keep ONE representative per duplicate group (the
    min id — deterministic), drop every other member. This is the step
    a pipeline actually runs after any of the pair generators (Jaccard /
    MinHash / SimHash / embedding-cosine).

    Scale shape: the drop list is |duplicates| rows of a single id
    column, anti-joined against the corpus on its key. NO broadcast
    hint: at web scale dedup drops 30-50% of documents, so the drop
    list is O(corpus) — forcing a broadcast would OOM every executor.
    Left to AQE, a genuinely small drop list still becomes a broadcast
    join at runtime; a large one gets the scale-safe shuffle anti-join.
    """
    comp = connected_components(pairs)
    drop = comp.where(F.col("component") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 20
) -> DataFrame:
    """The REMOVAL step of exact-substring dedup (Lee et al. 2022):
    every occurrence of a ``window``-token span that repeats anywhere in
    the corpus — beyond the first occurrence in (doc, pos) order — has
    its covered token positions cut out of the document; the first copy
    survives, so no content is lost, only repetition. Returns
    ``(id, text_clean, n_removed_tokens)`` for EVERY input document.

    Distributed shape: positions ride along with the rolling span
    hashes; a row_number window partitioned by the 8-byte hash finds
    non-first occurrences (rn > 1 already implies a duplicate — no
    count pass); their covered positions explode (bounded by
    window × dup occurrences), and one anti-join filters the token
    table before per-doc reassembly. Hazard at 100 TB: a stop-phrase
    span repeated millions of times piles its occurrences into one hash
    partition — cap with a df-style hot-span filter (as in
    ngram_jaccard's max_df) if the corpus has degenerate boilerplate.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("__tok")
    )
    spans = F.when(
        F.size("__tok") >= window,
        F.transform(
            F.sequence(F.lit(0), F.size("__tok") - window),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.concat_ws(" ", F.slice("__tok", i + 1, window))).alias(
                    "h"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    occ = toks.select("_id", F.explode(spans).alias("o")).select(
        "_id", F.col("o.pos").alias("pos"), F.col("o.h").alias("h")
    )
    w = Window.partitionBy("h").orderBy("_id", "pos")
    dup = (
        occ.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .select(
            "_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + window - 1)).alias(
                "p"
            ),
        )
        .distinct()
    )
    words = toks.select("_id", F.posexplode("__tok").alias("p", "word"))
    kept = words.join(dup, ["_id", "p"], "left_anti")
    cleaned = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("text_clean")
    )
    removed = dup.groupBy("_id").agg(F.count(F.lit(1)).alias("n_removed_tokens"))
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(cleaned, "_id", "left")
        .join(removed, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_removed_tokens", F.lit(0)).cast("long").alias(
                "n_removed_tokens"
            ),
        )
    )
