"""Deduplication operators over a document corpus — the training-data
pipeline staples: exact, MinHash/LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. All built from JVM-side expressions
(informers_spark.functions.similarity); the only shuffles are the
groupBys/joins keyed by content hash or band key (high-cardinality,
uniform — safe at 100 TB with the bucket-size skew guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from informers_spark.functions.similarity import (
    cosine,
    hamming_distance,
    jaccard,
    minhash_bands,
    minhash_signature,
    shingle_fingerprints,
    simhash,
)
from informers_spark.functions.text import fingerprint
from informers_spark.rebalance import (  # noqa: F401  (re-export)
    _is_narrow_scan,
    spread_scan,
)


def drop_oversized_buckets(
    blocks: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """Two-phase skew guard: drop every row of any key cell whose size
    exceeds max_bucket BEFORE a self-join can go quadratic on it.

    Phase 1 counts cells with groupBy — map-side partial aggregation
    shrinks even a pathological hot cell (10^9 copies of one license
    header at 100 TB) to one row per map task, so no single task ever
    materializes the cell. Phase 2 broadcast-ANTI-joins the (tiny)
    over-limit key set against the blocks table: a map-only filter.

    This replaces the earlier `count(*) over (partition by key)` window
    guard, which shuffled the entire hot cell into ONE window task just
    to count-and-drop it — the exact concentration the guard exists to
    prevent. Semantics are identical (cells > max_bucket vanish), so
    the DuckDB QUALIFY oracles still match."""
    over = (
        blocks.groupBy(*key_cols)
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > max_bucket)
        .select(*key_cols)
    )
    return blocks.join(F.broadcast(over), key_cols, "left_anti")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts by full-content hash; keep the min id.
    → (keeper, n_dups) one row per distinct text with duplicates counted.
    Shuffle key = sha2(text): uniform, no skew. At scale, group on the
    hash only (never the raw text) so shuffle rows stay small."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_dups"))
        .select("keeper", "n_dups")
    )


def minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 16,
    bands: int = 8,
    max_bucket: int = 200,
    threshold: float = 0.5,
    portable: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs by MinHash banding, verified with
    exact shingle-set Jaccard ≥ threshold. → (a, b, jac) with a < b.

    portable=False swaps the per-char rolling shingle hash for one
    xxhash64 call per shingle — the production path at corpus scale
    (the portable fold exists for bit-exact SQL-oracle parity and costs
    one fold step per character).

    Plan shape: one scan computes signature+shingles, explode to (band,
    key), bucket self-join (equi-join — NOT a cross join), exact-Jaccard
    verify on the joined shingle sets. The max_bucket guard caps any
    band bucket before the self-join (quadratic blowup protection).
    """
    # materialize the shingle/signature computation ONCE: the skew-guard
    # aggregate, both self-join sides, and both fps re-attach joins all
    # consume it — without a checkpoint Catalyst recomputes the per-char
    # fold 3-5x (measured 3x slower). At cluster scale this is the
    # stage boundary a warehouse checkpoint would give us anyway.
    base = (
        spread_scan(df)
        .select(
            F.col(id_col).alias("id"),
            shingle_fingerprints(F.col(text_col), shingle_n, portable=portable).alias("fps"),
        )
        .withColumn("sig", minhash_signature(F.col("fps"), k=k))
        .localCheckpoint()
    )
    # band WITHOUT the shingle arrays: the 8-way band explosion and the
    # bucket self-join shuffle only (id, band, key) — the heavy fps
    # arrays are re-attached once per side AFTER pair dedup (2 joins
    # instead of 8x array duplication through the shuffle)
    banded = base.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, k // bands)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    banded = drop_oversized_buckets(banded, ["band", "key"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    id_pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )
    fps = base.select("id", "fps")
    pairs = (
        id_pairs.join(fps.select(F.col("id").alias("a"), F.col("fps").alias("fa")), "a")
        .join(fps.select(F.col("id").alias("b"), F.col("fps").alias("fb")), "b")
        .withColumn("jac", jaccard(F.col("fa"), F.col("fb")))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", F.round("jac", 6).alias("jac"))
    )
    return pairs


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 31
) -> DataFrame:
    """→ (id, simhash) 31-bit portable SimHash per document."""
    return spread_scan(df).select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("simhash")
    )


def simhash_neardup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 31,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """SimHash near-duplicate pairs via banded pigeonhole blocking:
    split the fingerprint into `bands` bit-slices; two hashes within
    hamming distance < bands must agree on at least one slice, so the
    candidate join is an equi-join on (band, slice) — never all-pairs.
    Verified with the exact popcount(xor) distance ≤ max_hamming.
    → (a, b, hamming). Same window-count bucket guard as the other
    blocked dedups.

    Recall contract: EXACT for max_hamming <= bands - 1 (pigeonhole);
    for larger thresholds candidates are only block-collision pairs
    (LSH-style partial recall) — raise `bands` to max_hamming + 1 for
    guaranteed recall at a wider radius. Default keeps the two
    consistent (3 = bands - 1)."""
    base = spread_scan(df).select(
        F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("sh")
    )
    return simhash_pairs_from_hashes(
        base, max_hamming=max_hamming, bits=bits, bands=bands, max_bucket=max_bucket
    )


def _combinatorial_keep_masks(bits: int, d: int) -> list[int]:
    """Keep-masks for the generalized-pigeonhole blocking scheme: split
    `bits` into nb blocks; a pair within hamming distance d differs in at
    most d blocks, so it agrees exactly on the kept blocks of at least
    one d-combination. One mask per combination, with that combination's
    blocks zeroed — join keys are sh & keep_mask.

    nb = 8 blocks keeps C(nb, d) <= 70 for every d while making each key
    ~(bits - 4d) wide — vastly fewer random collisions than the d+1-band
    split (whose keys are only bits/(d+1) wide). d = 0 degenerates to a
    single full-hash key (exact-duplicate grouping)."""
    import itertools

    nb = max(d + 1, min(8, bits))
    widths = [bits // nb + (1 if i < bits % nb else 0) for i in range(nb)]
    starts = [sum(widths[:i]) for i in range(nb)]
    block_masks = [((1 << widths[i]) - 1) << starts[i] for i in range(nb)]
    full = (1 << bits) - 1
    keeps = []
    for combo in itertools.combinations(range(nb), d):
        drop = 0
        for i in combo:
            drop |= block_masks[i]
        keeps.append(full & ~drop)
    return keeps


def _simhash_pairs_clustered(
    base: DataFrame, d: int, bits: int, bands: int, width: int, max_bucket: int
) -> DataFrame:
    """Exact banded-semantics pair enumeration that DECIDES on distinct
    hashes and MOVES ids once (guide §8's decide-small/move-once shape,
    valid whenever max_hamming <= bands-1, capped or not).

    Why: the banded self-join's candidate volume is ~N²/2^(bits/bands)
    — measured 1.39e9 candidate rows at sf1.0 (50k docs, 8-bit band
    keys) for an output of ~5e6 pairs. Three structural fixes:

    1. All pair decisions run over DISTINCT hashes (measured 13,156 vs
       50,000 ids at sf1.0; bounded by 2^bits forever), so identical-
       hash clusters cost one row, not C(m,2) candidate rows.
    2. Candidate keys are combinatorial-pigeonhole masks (8 blocks,
       C(8,d) combos, each key keeping ~bits-4d bits) instead of
       bits/bands-wide band slices: random collisions drop from
       N²/2^8 to N²/2^23 (measured 1.53e6 candidate hash-pairs — 900x
       fewer), while recall stays exact for hamming <= d by the same
       pigeonhole argument.
    3. The bucket-cap semantics (DISTINCT pairs over SURVIVING (band,
       key) cells — the DuckDB-oracle contract) are reproduced by a
       retained-band bitmask per hash: cell sizes aggregate per
       DISTINCT hash weighted by cluster count, and a candidate pair
       survives iff some band both MATCHES (slice equality — bit math
       on the two hashes in hand) and SURVIVED (its bit in the mask;
       matching band => same cell => either side's mask works).

    id expansion is two hash-keyed equi-joins (cross pairs of two
    clusters) plus a same-hash self-join (within-cluster pairs,
    hamming 0) — output-sized work, exactly-once per pair, no
    distinct over id pairs."""
    clusters = base.groupBy("sh").agg(F.count("*").alias("cnt"))
    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band"),
                F.shiftright(F.col("sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    cells = clusters.select("sh", "cnt", F.explode(band_keys).alias("bk")).select(
        "sh", "cnt", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    over = (
        cells.groupBy("band", "key")
        .agg(F.sum("cnt").alias("_bn"))
        .filter(F.col("_bn") > max_bucket)
        .select("band", "key")
    )
    # retained-band bitmask per hash, computed unconditionally: in the
    # common uncapped case `over` is empty and rb = all bands set, so
    # the survival filters below are vacuously true — ONE plan for both
    # regimes, and no driver-side cap probe job (the r6 first cut spent
    # a limit(1).count() round-trip deciding which branch to build).
    shs = (
        cells.join(F.broadcast(over).withColumn("_c", F.lit(1)), ["band", "key"], "left")
        .groupBy("sh")
        .agg(
            F.sum(
                F.when(F.col("_c").isNull(), F.expr("shiftleft(1L, band)")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("rb")
        )
    )
    # consumed by both candidate-join sides and the same-hash survival set
    shs = shs.localCheckpoint()

    keeps = _combinatorial_keep_masks(bits, d)
    keys = F.array(
        *[
            F.struct(
                F.lit(ci).cast("int").alias("cb"),
                F.col("sh").bitwiseAND(F.lit(m)).alias("key"),
            )
            for ci, m in enumerate(keeps)
        ]
    )
    cb = shs.select("sh", "rb", F.explode(keys).alias("bk")).select(
        "sh", "rb", F.col("bk.cb").alias("cb"), F.col("bk.key").alias("key")
    )
    x, y = cb.alias("x"), cb.alias("y")
    sh_pairs = (
        x.join(y, ["cb", "key"])
        .filter(F.col("x.sh") < F.col("y.sh"))
        .select(
            F.col("x.sh").alias("sha"), F.col("y.sh").alias("shb"), F.col("x.rb").alias("rba")
        )
        .withColumn("hamming", hamming_distance(F.col("sha"), F.col("shb"), bits))
        .filter(F.col("hamming") <= d)
    )
    mask = F.lit((1 << width) - 1)
    surv = F.lit(False)
    for i in range(bands):
        eq_i = (
            F.shiftright(F.col("sha"), i * width).bitwiseAND(mask)
            == F.shiftright(F.col("shb"), i * width).bitwiseAND(mask)
        )
        surv = surv | (eq_i & (F.col("rba").bitwiseAND(F.lit(1 << i)) != F.lit(0)))
    sh_pairs = sh_pairs.filter(surv).select("sha", "shb", "hamming").distinct()

    ids = base
    diff = (
        sh_pairs.join(ids.select(F.col("id").alias("xi"), F.col("sh").alias("sha")), "sha")
        .join(ids.select(F.col("id").alias("yi"), F.col("sh").alias("shb")), "shb")
        .select(
            F.least("xi", "yi").alias("a"), F.greatest("xi", "yi").alias("b"), "hamming"
        )
    )
    sx, sy = ids.alias("sx"), ids.alias("sy")
    same = (
        sx.join(sy, "sh")
        .filter(F.col("sx.id") < F.col("sy.id"))
        .join(shs.filter(F.col("rb") != 0).select("sh"), "sh", "left_semi")
    )
    same = same.select(
        F.col("sx.id").alias("a"), F.col("sy.id").alias("b"), F.lit(0).cast("int").alias("hamming")
    )
    return same.unionAll(diff)


def simhash_pairs_from_hashes(
    base: DataFrame,
    max_hamming: int = 3,
    bits: int = 31,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Pair enumeration over an (id, sh) table — simhash_neardup minus the
    fingerprint computation, factored out so tests can drive exact hash
    values (the bucket-cap/first-band interaction below is unreachable at
    fixture scale through real texts)."""
    # materialize the (id, sh) fold ONCE: the two-phase guard's count
    # branch, its anti-join side, and both self-join sides all consume it
    # — without this the fingerprint computation re-runs per branch
    # (measured 7.4s -> 0.6s for the guarded blocks at sf0.1). Two tiny
    # columns; at cluster scale this is a warehouse-checkpoint stage.
    base = base.localCheckpoint()
    width = (bits + bands - 1) // bands
    if max_hamming <= bands - 1:
        # exact-recall regime: the banded candidate set (pairs sharing a
        # SURVIVING band cell, hamming-verified) is reproduced exactly by
        # the cluster-level plan — see _simhash_pairs_clustered. Only the
        # partial-recall regime (max_hamming > bands-1, where the result
        # is DEFINED as band-collision pairs) still needs the banded
        # self-join below.
        return _simhash_pairs_clustered(base, max_hamming, bits, bands, width, max_bucket)
    keys = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band"),
                F.shiftright(F.col("sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    blocks = base.select("id", "sh", F.explode(keys).alias("bk")).select(
        "id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # two-phase skew guard (see drop_oversized_buckets), with a bounded
    # driver-side probe on the over-limit key set: limit(1).count() on a
    # map-side-aggregated groupBy (the canon.py class of documented
    # probes). In the COMMON case no cell is capped and the retained-band
    # bitmask below is a constant — skipping its id-keyed window shuffle
    # (measured ~2s of the 4.4s query at sf0.1).
    over = (
        blocks.groupBy("band", "key")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > max_bucket)
        .select("band", "key")
    )
    if over.limit(1).count() == 0:
        # nothing capped: every band retained for every id
        blocks = blocks.withColumn("rb", F.lit(-1).cast("long")).localCheckpoint()
    else:
        # retained-band bitmask per id: bit i set iff this id's band-i
        # block SURVIVED the bucket cap. Needed by the first-matching-band
        # filter below — without it, a pair whose earliest matching band
        # was capped would be rejected in every surviving band too and
        # silently lost (the guard's own skew scenario). One id-keyed
        # window shuffle (high-cardinality uniform key); checkpointed
        # since the blocks feed BOTH self-join sides.
        blocks = (
            blocks.join(F.broadcast(over), ["band", "key"], "left_anti")
            .withColumn(
                "rb", F.sum(F.expr("shiftleft(1L, band)")).over(Window.partitionBy("id"))
            )
            .localCheckpoint()
        )
    # Salted self-join: a dense cluster puts its whole C(n,2) pair
    # enumeration in ONE (band, key) task; salting the left side by id
    # and replicating the right across the salt space spreads the same
    # exact pair set over n_salt tasks (pair (a,b) is produced exactly
    # once, under a's salt). Corpora with heavy template reuse hit this
    # hard — measured 23s -> ~3s for the candidate join at sf0.1.
    n_salt = 16
    a = blocks.withColumn("_s", F.pmod(F.xxhash64("id"), F.lit(n_salt)))
    b = blocks.withColumn(
        "_s", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salt)]))
    )
    # first-matching-band dedup: a pair that collides in k surviving bands
    # would be enumerated k times; instead of a distinct() (a full shuffle
    # of the pair set), emit the pair ONLY in its smallest SURVIVING
    # matching band. Both fingerprints are in hand post-join, so slice
    # equality is bit arithmetic; survival of an earlier band i is bit i
    # of the retained-band mask (when the slices match, both ids sit in
    # the SAME (i, key) cell, so checking one side's mask suffices).
    # Exactly-once per pair, no shuffle.
    def slice_eq(col_a, col_b, i):
        mask = F.lit((1 << width) - 1)
        return (
            F.shiftright(col_a, i * width).bitwiseAND(mask)
            == F.shiftright(col_b, i * width).bitwiseAND(mask)
        )

    no_earlier = F.lit(True)
    for i in range(bands - 1):
        earlier_match = slice_eq(F.col("a.sh"), F.col("b.sh"), i) & (
            F.col("a.rb").bitwiseAND(F.lit(1 << i)) != F.lit(0)
        )
        no_earlier = no_earlier & ((F.col("band") <= F.lit(i)) | ~earlier_match)
    return (
        a.alias("a").join(b.alias("b"), ["band", "key", "_s"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(no_earlier)
        .select(
            F.col("a.id").alias("a"), F.col("b.id").alias("b"),
            hamming_distance(F.col("a.sh"), F.col("b.sh"), bits).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def fingerprint_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id, fp) rolling-hash document fingerprint (portable arithmetic)."""
    return spread_scan(df).select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp")
    )


def embedding_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bands: int = 4,
    planes_per_band: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by BANDED
    hyperplane-sign LSH (bands tables × planes_per_band planes,
    OR-amplified — a near-pair that differs on one plane sign in one
    table still collides in another). → (a, b, cos_sim).

    Scale shape: the self-join is an equi-join on (band, bucket); the
    window-count guard drops any cell above max_bucket BEFORE the join,
    so a dense embedding region (the 100-TB failure mode of single-table
    LSH) can never go quadratic. Vectors are re-attached to the deduped
    id pairs, so the blocking shuffle carries only (id, band, bucket)."""
    from informers_spark.operators.ann import _banded_blocks

    blocks = _banded_blocks(df, id_col, vec_col, "id", bands, planes_per_band, max_bucket)
    a, b = blocks.alias("a"), blocks.alias("b")
    id_pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        id_pairs.join(vecs.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
        .join(vecs.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    **neardup_kwargs,
) -> DataFrame:
    """End-to-end near-duplicate REMOVAL — the composed training-data
    operator: simhash_neardup pairs → connected components over the pair
    graph → keep exactly one representative (the min id) per duplicate
    cluster, drop the rest. → the deduplicated corpus (all original
    columns). Every stage is the already-skew-guarded operator: banded
    blocking, salted self-join, size-tiered components; the final drop
    is a left_anti join on ids only (the corpus content never reshuffles)."""
    from informers_spark.operators.canon import connected_components

    pairs = simhash_neardup(
        df, text_col=text_col, id_col=id_col, max_hamming=max_hamming, **neardup_kwargs
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(edges)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
