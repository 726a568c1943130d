"""End-to-end dedup pipelines composing sketch -> bands -> flags/pairs ->
clusters, plus the order-dependent add-if-unique emulation.

Three duplicate definitions coexist in the reference (SURVEY.md §2.5 note);
all three are implemented here:

1. one-shot band-collision flags (benchmark metric) -> ``dup_flags``
2. sequential add-if-unique (RMinHashDeduplicator) -> ``add_if_unique``
3. pairwise verify + min-id clustering (README recipe, generalized to
   connected components per the north rule) -> ``dedup_clusters``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rensa_spark.config import RensaConfig
from rensa_spark.functions.udfs import (
    jaccard_udf,
    rho_sketch_udf,
    rminhash_bands_udf,
)
from rensa_spark.operators.cc import connected_components, survivors
from rensa_spark.operators.lsh import candidate_pairs


def sketch_rminhash(
    df: DataFrame, cfg: RensaConfig, key_col: str, text_col: str, with_sig: bool = True
) -> DataFrame:
    """Add `sig` (and `bands`) columns. Hot path: only `bands` when the
    signature itself is not needed downstream (flags-only pipelines).
    With the signature, ONE fused UDF computes both (round 6): the former
    separate sig/bands UDFs each re-ran the full shingle+MinHash pass —
    banding is a pure function of the signature, so fusing is bit-equal."""
    if with_sig:
        from rensa_spark.functions.udfs import rminhash_sig_bands_udf

        sb = rminhash_sig_bands_udf(cfg)
        return (
            df.withColumn("_sb", sb(F.col(text_col)))
            .withColumn("bands", F.col("_sb.bands"))
            .withColumn("sig", F.col("_sb.sig"))
            .drop("_sb")
        )
    bands = rminhash_bands_udf(cfg)
    return df.withColumn("bands", bands(F.col(text_col)))


def sketch_rho(df: DataFrame, cfg: RensaConfig, key_col: str, text_col: str) -> DataFrame:
    sk = rho_sketch_udf(cfg)
    return df.withColumn("_rho", sk(F.col(text_col))).select("*", "_rho.*").drop("_rho")


def dup_flags(df: DataFrame, cfg: RensaConfig, key_col: str, text_col: str) -> DataFrame:
    """Flagship: one-shot duplicate flags over R-MinHash bands
    (= query_duplicate_flags_matrix_one_shot fast path on a matrix built
    from word-{ngram}-shingled text, the reference benchmark's accuracy
    metric, benchmarks/full_benchmark.py:542-547). Fused mapInPandas sketch
    -> pre-exploded band rows -> window bucket count -> per-key max."""
    from rensa_spark.operators.lsh import one_shot_flags_from_bands
    from rensa_spark.operators.sketch import rminhash_band_rows

    return one_shot_flags_from_bands(
        rminhash_band_rows(df, cfg, key_col, text_col),
        keys=df.select(
            F.col(key_col).alias("key"), F.lit(cfg.num_bands).alias("n_bands")
        ),
    )


def verified_pairs(
    sketched: DataFrame,
    cfg: RensaConfig,
    key_col: str = "key",
    capped_metrics="rensa_capped_buckets",
) -> DataFrame:
    """Candidate pairs from band co-membership, verified by signature-slot
    jaccard >= threshold (README.md:100-122 recipe). Input needs `sig` and
    `bands` columns. Signatures are re-joined to pairs rather than carried
    through the band explode (keeps the wide column out of the band shuffle).
    ``capped_metrics`` forwards to candidate_pairs (CollectMetrics signal;
    pass an Observation to read bucket stats after the first action)."""
    pairs = candidate_pairs(
        sketched.select(F.col(key_col).alias("key"), "bands"),
        "key",
        hot_bucket_cap=cfg.hot_bucket_cap,
        # >cap buckets: exact in-task verify up to exact_task_cap members
        # (capped == uncapped), hub + sig-sorted ring beyond that
        sort_keys=sketched.select(
            F.col(key_col).alias("key"), F.col("sig").alias("sort_key")
        ),
        verify_threshold=cfg.threshold,
        capped_metrics=capped_metrics,
    )
    sigs = sketched.select(F.col(key_col).alias("key"), "sig")
    return _verify_pairs(pairs, sigs, cfg)


def verified_pairs_from_band_rows(
    band_rows: DataFrame, sigs: DataFrame, cfg: RensaConfig
) -> DataFrame:
    """Same, from (key, band_idx, band_hash) rows + (key, sig) table —
    the checkpointed-pipeline path (band order already positional)."""
    from rensa_spark.operators.lsh import candidate_pairs_from_band_rows

    pairs = candidate_pairs_from_band_rows(
        band_rows,
        cfg.hot_bucket_cap,
        sort_keys=sigs.select("key", F.col("sig").alias("sort_key")),
        verify_threshold=cfg.threshold,
    )
    return _verify_pairs(pairs, sigs, cfg)


def _verify_pairs(pairs: DataFrame, sigs: DataFrame, cfg: RensaConfig) -> DataFrame:
    jac = jaccard_udf(cfg)
    return (
        pairs.join(sigs.withColumnRenamed("key", "a").withColumnRenamed("sig", "sig_a"), "a")
        .join(sigs.withColumnRenamed("key", "b").withColumnRenamed("sig", "sig_b"), "b")
        .withColumn("sim", jac("sig_a", "sig_b"))
        .select("a", "b", "sim")
        .filter(F.col("sim") >= cfg.threshold)
    )


def dedup_edges(
    sketched: DataFrame,
    cfg: RensaConfig,
    capped_metrics="rensa_capped_buckets",
) -> DataFrame:
    """Duplicate-graph edges (a, b) for clustering: identical-signature
    collapse + verified pairs among representatives.

    Rows with IDENTICAL signatures are unconditionally duplicates (equal-slot
    fraction 1.0 >= any threshold), so each identical-sig group collapses to
    its min-key representative with trivial (rep, member) edges, and the
    O(cluster^2) pair expansion runs only over representatives. Exactly
    component-preserving; on dup-heavy corpora this removes the quadratic
    blowup of exact-duplicate clusters (measured 7.6M -> ~100k verified
    pairs on the 200k benchmark corpus).

    The representative rides in via ONE window over the sig partitioning
    (round 6): the former groupBy(sig) + join-back-on-sig shuffled the
    128-slot signature twice; min-over-partition needs a single exchange.
    The lazy checkpoint feeds both consumers (trivial edges + rep rows)
    without re-running the shuffle."""
    from pyspark.sql import Window

    with_rep = (
        sketched.select("key", "sig", "bands")
        .withColumn("rep", F.min("key").over(Window.partitionBy("sig")))
        .localCheckpoint(eager=False)
    )
    trivial = with_rep.filter(F.col("key") != F.col("rep")).select(
        F.col("rep").alias("a"), F.col("key").alias("b")
    )
    rep_rows = with_rep.filter(F.col("key") == F.col("rep")).select("key", "sig", "bands")
    rep_pairs = verified_pairs(
        rep_rows, cfg, capped_metrics=capped_metrics
    ).select("a", "b")
    return trivial.unionByName(rep_pairs)


def dedup_clusters(
    df: DataFrame, cfg: RensaConfig, key_col: str, text_col: str
) -> DataFrame:
    """(key, cluster_id, is_survivor) — verified-pair connected components
    with min-key survivor selection.

    No sketch persist any more (round 6): dedup_edges consumes the sketch
    lineage exactly ONCE (its identical-sig window is lazily checkpointed
    and feeds every downstream branch), so caching the sketch only added a
    memory-pinning write. The survivor pass reads only the key column from
    the source again (pruned scan)."""
    base = df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text"))
    sk = sketch_rminhash(base, cfg, "key", "text")
    edges = dedup_edges(sk, cfg)
    clusters = connected_components(edges)  # eager: materializes edges
    return survivors(clusters, base.select("key"))


def multimodal_dedup_clusters(
    df: DataFrame,
    cfg: RensaConfig,
    key_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
) -> DataFrame:
    """Image+caption dedup (north rule: "captions shingled into k-grams and
    images keyed by phash"): duplicate edges are the UNION of
    - exact pixel duplicates: equal ``phash`` (the pre-hashed single-token
      key per SURVEY §2.6 image-keying row), and
    - caption near-duplicates: verified MinHash pairs,
    clustered together by connected components; survivor = min key.
    The hot path touches only (key, caption, phash) — never image bytes."""
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(caption_col).alias("text"),
        F.col(phash_col).alias("phash"),
    )
    # no persist (round 6): dedup_edges consumes the sketch exactly once
    # via its checkpointed identical-sig window
    sk = sketch_rminhash(base, cfg, "key", "text")
    edges = multimodal_dedup_edges(df, cfg, key_col, caption_col, phash_col, _sk=sk)
    clusters = connected_components(edges)  # eager: materializes edges
    return survivors(clusters, base.select("key"))


def multimodal_dedup_edges(
    df: DataFrame,
    cfg: RensaConfig,
    key_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    _sk: DataFrame | None = None,
) -> DataFrame:
    """The LAZY duplicate-edge set of :func:`multimodal_dedup_clusters`
    (equal-phash ∪ verified caption pairs) — exposed so the plan-shape test
    can assert the hot path never scans image bytes on the un-executed plan."""
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(caption_col).alias("text"),
        F.col(phash_col).alias("phash"),
    )
    sk = _sk if _sk is not None else sketch_rminhash(base, cfg, "key", "text")
    caption_edges = dedup_edges(sk, cfg)
    phash_reps = base.groupBy("phash").agg(F.min("key").alias("rep"))
    phash_edges = (
        base.join(phash_reps, "phash")
        .filter(F.col("key") != F.col("rep"))
        .select(F.col("rep").alias("a"), F.col("key").alias("b"))
    )
    return caption_edges.unionByName(phash_edges)


def add_if_unique(
    df: DataFrame,
    cfg: RensaConfig,
    key_col: str,
    text_col: str,
    order_col: str | None = None,
    max_rounds: int = 30,
    use_lsh: bool = True,
    brute_force_max_rows: int = 100_000,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Batch emulation of RMinHashDeduplicator.add_pairs with use_lsh=True
    (src/inline_dedup/rminhash.rs:233-299): process rows in ``order_col``
    order; keep a row iff no *earlier kept* row shares >=1 LSH band AND has
    signature jaccard >= threshold.

    Exact equivalence argument: a kept item's bands enter the index exactly
    once and never change, so "LSH candidate at add time" == static band
    co-membership with an earlier kept row. kept(i) is therefore the
    lexicographically-greedy maximal independent set of the DAG of verified
    conflict edges (j -> i for j earlier), computed here by frontier rounds:
    a row is decidable once all its earlier conflict-neighbors are decided;
    decided-kept iff none of them was kept. Duplicate chains are short
    (SURVEY.md §7 hard part 2), so rounds ~= chain length.

    Round 6: when the verified conflict-edge set is small
    (``driver_max_edges``, env RENSA_AIU_DRIVER_MAX_EDGES, default
    200_000 — a few MB collected), the greedy recursion kept(v) =
    not any(kept(u) for u -> v) is evaluated directly on the driver in
    topological order and broadcast-joined back: the edge set is already
    materialized (and counted) for the frontier loop, so the small case
    replaces rounds of checkpoint+count jobs with one tiny collect. The
    frontier loop remains the scale path, bit-equal by construction
    (pinned by test_add_if_unique_driver_greedy_matches_loop).

    Returns (key, kept boolean).
    """
    import os

    if driver_max_edges is None:
        driver_max_edges = int(os.environ.get("RENSA_AIU_DRIVER_MAX_EDGES", "200000"))
    order_col = order_col or key_col
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("ord"),
        F.col(text_col).alias("text"),
    )
    # the fused sketch is consumed up to 4x by verified_pairs (band rows,
    # mid-path sort keys, both signature join sides) — checkpoint it once
    # (round 6: each consumer used to re-run the shingle+MinHash UDFs)
    sk = (
        sketch_rminhash(base, cfg, "key", "text")
        .select("key", "sig", "bands")
        .localCheckpoint(eager=False)
    )
    if use_lsh:
        pairs = verified_pairs(sk, cfg)  # a < b by key; re-orient by ord
    else:
        # CMinHashDeduplicator semantics: brute-force against ALL kept items
        # (src/inline_dedup/cminhash.rs:165-242 — no LSH index). Cross-join
        # of signatures; only viable for small kept sets, kept for API
        # parity. jaccard >= threshold is the only gate. Guarded: the O(n^2)
        # join must never ship at scale by accident.
        n_rows = base.count()
        if n_rows > brute_force_max_rows:
            raise ValueError(
                f"add_if_unique(use_lsh=False) is an O(n^2) brute-force "
                f"cross join (CMinHashDeduplicator API parity); input has "
                f"{n_rows} rows > brute_force_max_rows="
                f"{brute_force_max_rows}. Use use_lsh=True (the banded-LSH "
                f"path) at scale, or raise brute_force_max_rows explicitly."
            )
        jac = jaccard_udf(cfg)
        left = sk.select(F.col("key").alias("a"), F.col("sig").alias("sig_a"))
        right = sk.select(F.col("key").alias("b"), F.col("sig").alias("sig_b"))
        pairs = (
            left.join(right, F.col("a") < F.col("b"))
            .withColumn("sim", jac("sig_a", "sig_b"))
            .filter(F.col("sim") >= cfg.threshold)
            .select("a", "b", "sim")
        )
    ords = base.select("key", "ord")
    edges = (
        pairs.join(ords.withColumnRenamed("key", "a").withColumnRenamed("ord", "ord_a"), "a")
        .join(ords.withColumnRenamed("key", "b").withColumnRenamed("ord", "ord_b"), "b")
        .select(
            F.when(F.col("ord_a") <= F.col("ord_b"), F.col("a")).otherwise(F.col("b")).alias("early"),
            F.when(F.col("ord_a") <= F.col("ord_b"), F.col("b")).otherwise(F.col("a")).alias("late"),
        )
    ).localCheckpoint(eager=True)

    if edges.count() <= driver_max_edges:
        from collections import defaultdict, deque

        from pyspark.sql.types import BooleanType, StructField, StructType

        preds: dict = defaultdict(list)
        succs: dict = defaultdict(list)
        indeg: dict = defaultdict(int)
        nodes = set()
        for r in edges.collect():
            e, l = r["early"], r["late"]
            preds[l].append(e)
            succs[e].append(l)
            indeg[l] += 1
            nodes.add(e)
            nodes.add(l)
        kept: dict = {}
        dq = deque(sorted(n for n in nodes if indeg[n] == 0))
        seen = 0
        while dq:
            v = dq.popleft()
            seen += 1
            kept[v] = not any(kept[u] for u in preds[v])
            for w in succs[v]:
                indeg[w] -= 1
                if indeg[w] == 0:
                    dq.append(w)
        if seen == len(nodes):  # acyclic (always, by ord orientation)
            spark = df.sparkSession
            key_field = base.select("key").schema.fields[0]
            decided = spark.createDataFrame(
                [(k, bool(v)) for k, v in kept.items()],
                StructType(
                    [
                        StructField("key", key_field.dataType),
                        StructField("kept_d", BooleanType()),
                    ]
                ),
            )
            return (
                base.select("key")
                .join(F.broadcast(decided), "key", "left")
                .select("key", F.coalesce("kept_d", F.lit(True)).alias("kept"))
            )
        # a cycle can only mean corrupted input ordering — fall through to
        # the frontier loop, which raises after max_rounds

    # ONE fused state table (key, kept: true/false/null=undecided), ONE
    # localCheckpoint + ONE count per round (round-3: the separate
    # kept/undecided tables cost two checkpoint jobs per round — fusing
    # measured ~10% faster at sf0.1 with bit-equal output). A row is
    # decidable once all its earlier conflict-neighbors are decided
    # (frontier = undecided minus lates with an undecided early); it is
    # kept iff no earlier KEPT neighbor reaches it. Keys are unique, so
    # every set op is a key-join; a non-empty DAG always has a non-empty
    # frontier, so the loop cannot stall.
    state = base.select(
        "key", F.lit(None).cast("boolean").alias("kept")
    ).localCheckpoint(eager=True)
    n_undecided = state.filter(F.col("kept").isNull()).count()
    for _ in range(max_rounds):
        if n_undecided == 0:
            break
        und = state.filter(F.col("kept").isNull()).select("key")
        live_edges = edges.join(
            und.withColumnRenamed("key", "late"), "late", "leftsemi"
        )
        blocked = (
            live_edges.join(und.withColumnRenamed("key", "early"), "early", "leftsemi")
            .select(F.col("late").alias("key"))
            .distinct()
        )
        frontier = und.join(blocked, "key", "left_anti")
        kept_early = state.filter(F.col("kept") == True).select(  # noqa: E712
            F.col("key").alias("early")
        )
        frontier_dup = (
            edges.join(kept_early, "early", "leftsemi")
            .select(F.col("late").alias("key"))
            .join(frontier, "key", "leftsemi")
            .distinct()
            .withColumn("dup", F.lit(True))
        )
        newly = frontier.join(frontier_dup, "key", "left").select(
            "key", F.col("dup").isNull().alias("new_kept")
        )
        state = (
            state.join(newly, "key", "left")
            .select("key", F.coalesce("kept", "new_kept").alias("kept"))
            .localCheckpoint(eager=True)
        )
        n_undecided = state.filter(F.col("kept").isNull()).count()
    else:
        raise RuntimeError(
            f"add_if_unique did not converge in {max_rounds} rounds; "
            "conflict chains longer than expected"
        )
    return state.select("key", "kept")


def exact_dup_flags(
    df: DataFrame, key_col: str, text_col: str, verify: bool = True
) -> DataFrame:
    """Exact dedup by full-text equality: (key, is_dup, group_size,
    is_survivor) where the survivor is the min key of each text group.

    Scale shape: the aggregation and join key is ``(xxhash64(text),
    length(text))`` — 16 bytes/row through both exchanges — never the
    document body. Equal text implies equal (hash, length), so groups are a
    refinement-free superset keying: a false merge needs a 64-bit xxhash
    collision at identical length. With ``verify=True`` (default) a second
    independent 64-bit hash (different seed column prepended) joins the
    grouping key, so a false merge additionally needs a simultaneous
    collision of both hashes (~2^-128 per pair) while a hash-split can never
    create a false dup (splitting a group only turns dups into non-dups,
    and only under a same-length double-collision). This is the standard
    production exact-dedup keying; grouping by the raw text would move the
    full corpus through two shuffles at 100 TB.
    """
    gcols = ["_xh", "_len"] + (["_xh2"] if verify else [])
    keyed = df.select(
        F.col(key_col),
        F.xxhash64(text_col).alias("_xh"),
        F.length(text_col).alias("_len"),
        *(
            [F.xxhash64(F.lit("rensa-exact-v2"), text_col).alias("_xh2")]
            if verify
            else []
        ),
    )
    w_cnt = keyed.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("group_size"), F.min(key_col).alias("keep")
    )
    return keyed.join(w_cnt, gcols).select(
        F.col(key_col).alias("key"),
        (F.col("group_size") >= 2).alias("is_dup"),
        "group_size",
        (F.col(key_col) == F.col("keep")).alias("is_survivor"),
    )
