"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane) approximate variant as the scale path: at 10^9+ vectors
the bucketed form probes only matching-signature buckets, turning a full
cross-product into a short equi-join.

Dot products run as ``F.aggregate``/``F.zip_with`` array expressions
(JVM-side); the hyperplane projections use a deterministic pseudo-random
basis derived from xxhash64 so signatures are stable across runs/cluster
sizes (the engine-wide determinism contract, src/utils.py:112-127 analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard: an all-zero vector (a
    common padding / failed-encode artifact) used to yield 0.0/0.0 — NaN
    without ANSI (which Spark sorts ABOVE every number: rank-1 pollution
    and a universal pass of >= threshold filters), a DIVIDE_BY_ZERO job
    failure under Spark 4's default ANSI mode (review r5). try_divide +
    coalesce maps it to -2.0, below any real cosine — the same convention
    as the driver-side _probe_cids mirror."""
    return F.coalesce(
        F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(-2.0)
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine against one query vector: map-side score (the
    query broadcasts as a literal array), then a single ordered take —
    Spark's sort-based TakeOrderedAndProject, no full sort shuffle.

    Rows whose vector length differs from the query's are EXCLUDED (a
    mixed-model corpus would otherwise null-pad through zip_with into
    silent NULL scores, review r5); the query's own norm is computed once
    driver-side instead of re-folding the literal array per row."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    v = F.col(vec_col).cast("array<double>")
    sim = F.coalesce(
        F.try_divide(_dot(v, q), _norm(v) * F.lit(float(qn))), F.lit(-2.0)
    )
    scored = df.filter(F.size(F.col(vec_col)) == len(query_vec)).select(
        F.col(id_col),
        F.round(sim, round_digits).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane p is a signed value derived from a splitmix-style integer mix —
    stable across runs with no RNG state."""
    out = []
    for j in range(dim):
        z = (plane * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        z = (z ^ (z >> 31)) * 0x7FB5D329728EA185 % (1 << 64)
        out.append(((z >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def rh_signature(vec_col: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane (SimHash-for-vectors) signature: bit p = sign of
    <v, h_p>. Returns a long; equal signatures = candidate neighbors."""
    v = vec_col.cast("array<double>")
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        h = F.array(*[F.lit(x) for x in _hyperplane(dim, p + 1)])
        sig = sig + F.when(
            _dot(v, h) > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(F.lit(0).cast("long"))
    return sig


def rh_band_signatures(
    vec_col: Column, dim: int, n_bands: int = 6, band_bits: int = 8
) -> Column:
    """Multi-probe banding (the MinHash-LSH OR-amplification trick applied
    to random-hyperplane signatures): ``n_bands`` INDEPENDENT shorter
    signatures of ``band_bits`` planes each — a pair is a candidate when
    ANY band matches, so recall amplifies as 1-(1-p^r)^b instead of the
    single-signature p^r cliff (VERDICT r2 #4). Returns array<long>; entry
    b encodes (b << band_bits) | sig_b so equal sig values in different
    bands can never collide. Band 0 uses the same plane sequence as
    ``rh_signature`` (plane indices are global and deterministic)."""
    v = vec_col.cast("array<double>")
    out = []
    for b in range(n_bands):
        sig = F.lit(0).cast("long")
        for p in range(band_bits):
            h = F.array(*[F.lit(x) for x in _hyperplane(dim, b * band_bits + p + 1)])
            sig = sig + F.when(
                _dot(v, h) > 0, F.shiftleft(F.lit(1).cast("long"), p)
            ).otherwise(F.lit(0).cast("long"))
        out.append(sig + F.lit(b << band_bits).cast("long"))
    return F.array(*out)


def _py_rh_signature(query_vec: list[float], n_planes: int, plane_offset: int = 0) -> int:
    import builtins

    dim = len(query_vec)
    sig = 0
    for p in range(n_planes):
        d = builtins.sum(
            q * h for q, h in zip(query_vec, _hyperplane(dim, plane_offset + p + 1))
        )
        if d > 0:
            sig |= 1 << p
    return sig


def _py_band_signatures(query_vec: list[float], n_bands: int, band_bits: int) -> list[int]:
    """Driver-side mirror of :func:`rh_band_signatures` for one query."""
    return [
        (b << band_bits) | _py_rh_signature(query_vec, band_bits, b * band_bits)
        for b in range(n_bands)
    ]


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_bands: int | None = None,
) -> DataFrame:
    """IVF/LSH-style ANN: filter to signature-matching candidates, then
    exact-rank the survivors.

    Default (``n_bands=None``): one ``n_planes``-bit signature, candidates
    within hamming distance 1 — cheap but recall-poor on unstructured
    vectors. ``n_bands=b``: b independent ``n_planes``-bit bands, candidate
    iff ANY band matches exactly (multi-probe OR-amplification) — the
    recall path; probe cost stays ~b/2^n_planes of the data per band."""
    dim = len(query_vec)
    if n_bands:
        bands_col = rh_band_signatures(F.col(vec_col), dim, n_bands, n_planes)
        qbands = _py_band_signatures(query_vec, n_bands, n_planes)
        cand = df.filter(
            F.arrays_overlap(bands_col, F.array(*[F.lit(x).cast("long") for x in qbands]))
        )
        return brute_force_topk(cand, query_vec, k, id_col, vec_col)
    sig_col = rh_signature(F.col(vec_col), dim, n_planes)
    qsig = _py_rh_signature(query_vec, n_planes)
    cand = df.withColumn("__sig", sig_col).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= 1
    )
    return brute_force_topk(cand.drop("__sig"), query_vec, k, id_col, vec_col)


def build_ann_index(
    df: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int | None = None,
) -> None:
    """Materialize an IVF/LSH-style index: vectors written as parquet
    PARTITIONED BY their hyperplane-signature bucket. A query then reads
    only the partitions within the probe's reach — partition pruning does
    the candidate selection, no full scan, no recomputed signatures. This
    is the disk layout a 10^9-vector corpus wants; the in-memory ann_topk
    is the ad-hoc variant.

    ``n_bands=b`` writes the multi-probe layout: each vector appears once
    per band (b× storage), partitioned by the band-encoded signature —
    the classic LSH index trade of space for recall. ``None`` keeps the
    single-signature layout."""
    if n_bands:
        sig = F.explode(
            rh_band_signatures(F.col(vec_col), dim, n_bands, n_planes)
        ).alias("sig_bucket")
    else:
        sig = rh_signature(F.col(vec_col), dim, n_planes).alias("sig_bucket")
    df.select(id_col, vec_col, sig).write.mode("overwrite").partitionBy(
        "sig_bucket"
    ).parquet(path)
    import json

    from ..fsio import write_text_file

    # sidecar goes through the Hadoop FS API so it lands next to the
    # parquet on ANY scheme (hdfs://, s3a://), not the driver's local disk
    write_text_file(
        df.sparkSession,
        path.rstrip("/") + "/_ann_meta.json",
        json.dumps(
            {"dim": dim, "n_planes": n_planes, "n_bands": n_bands,
             "vec_col": vec_col, "id_col": id_col}
        ),
    )


def query_ann_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    hamming_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int | None = None,
) -> DataFrame:
    """Probe the materialized index: enumerate the signature buckets within
    ``hamming_radius`` of the query's signature(s) (a small driver-side
    set), scan ONLY those partitions (pruned at planning time via the
    partition-column filter), exact-rank the survivors. For a banded index
    the radius applies WITHIN each band (multi-probe: every band's exact
    bucket plus its 1-bit flips); a vector reached through several bands
    is deduplicated before ranking."""
    import json

    from ..fsio import exists, read_text_file

    meta_path = path.rstrip("/") + "/_ann_meta.json"
    if exists(spark, meta_path):
        meta = json.loads(read_text_file(spark, meta_path))
        if meta["dim"] != len(query_vec):
            raise ValueError(
                f"query dim {len(query_vec)} != index dim {meta['dim']}"
            )
        if meta["n_planes"] != n_planes:
            raise ValueError(
                f"n_planes {n_planes} != index n_planes {meta['n_planes']} "
                "(signatures would not be comparable)"
            )
        if meta.get("n_bands") != n_bands:
            raise ValueError(
                f"n_bands {n_bands} != index n_bands {meta.get('n_bands')} "
                "(bucket encoding would not be comparable)"
            )

    if hamming_radius > 2:
        raise ValueError(
            f"hamming_radius {hamming_radius} not supported: probe expansion "
            "enumerates radius <= 2 (a larger radius would silently return "
            "radius-2 recall, review r5); use more bands for higher recall"
        )

    def _expand(sig: int, width: int, base: int) -> list[int]:
        out = [base | sig]
        if hamming_radius >= 1:
            out += [base | (sig ^ (1 << p)) for p in range(width)]
        if hamming_radius >= 2:
            out += [
                base | (sig ^ (1 << a) ^ (1 << b))
                for a in range(width)
                for b in range(a + 1, width)
            ]
        return out

    buckets: list[int] = []
    if n_bands:
        for b in range(n_bands):
            sig = _py_rh_signature(query_vec, n_planes, b * n_planes)
            buckets += _expand(sig, n_planes, b << n_planes)
    else:
        buckets = _expand(_py_rh_signature(query_vec, n_planes), n_planes, 0)
    cand = spark.read.parquet(path).filter(F.col("sig_bucket").isin(buckets))
    if n_bands:
        cand = cand.dropDuplicates([id_col])
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int | None = None,
    max_block: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family variant
    over vector columns: emit (id_a < id_b, cos_sim) for pairs with
    cosine >= threshold.

    Blocking: with ``n_planes`` set, candidates are restricted to vectors
    sharing a random-hyperplane signature (rh_signature) — the scale path:
    near-identical embeddings land in the same bucket with high
    probability and the quadratic work shrinks to per-bucket blocks.
    Without it, one global block = exact all-pairs (verification/oracle
    path for bounded inputs). Either way, oversized blocks split into the
    exact B x B sub-bucket grid (same machinery as pairwise_topk_per_label)
    so no single task goes quadratic in the block size."""
    if n_planes and dim is None:
        raise ValueError("cosine_near_dup_pairs: dim is required when n_planes is set "
                         "(hyperplane signatures need the vector dimension)")
    blk = (
        rh_signature(F.col(vec_col), dim, n_planes)
        if n_planes
        else F.lit(0).cast("long")
    )
    d2 = df.select(F.col(id_col), F.col(vec_col), blk.alias("__blk"))
    pairs = _blocked_pair_grid(d2, "__blk", id_col, vec_col, max_block).filter(
        F.col("id_a") < F.col("id_b")
    )
    # threshold on the UNROUNDED cosine (rounding first would admit pairs up
    # to half an ulp-of-round below threshold); round only the emitted column
    scored = pairs.select("id_a", "id_b", _pair_cosine().alias("__cos"))
    return scored.filter(F.col("__cos") >= threshold).select(
        "id_a", "id_b", F.round(F.col("__cos"), round_digits).alias("cos_sim")
    )


def _blocked_pair_grid(
    d2: DataFrame, block_col: str, id_col: str, vec_col: str, max_block: int
) -> DataFrame:
    """The shared B x B skew-split pair grid (review r5: previously
    copy-pasted between cosine_near_dup_pairs and pairwise_topk_per_label):
    within each block, rows pair all-against-all, but blocks larger than
    ``max_block`` split into B = ceil(n/max_block) deterministic hash
    sub-buckets; the a-side replicates each row B times keyed
    (bucket(a), j), the b-side keyed (i, bucket(b)), so every pair meets
    exactly once in task (bucket(a), bucket(b)) — exact results, bounded
    per-task memory. Per-row norms are computed ONCE per side here
    (``__n_a``/``__n_b``), cutting the per-pair array folds from three to
    one; score pairs with :func:`_pair_cosine`."""
    v = F.col(vec_col).cast("array<double>")
    d3 = d2.select(F.col(block_col), F.col(id_col), v.alias("__v"), _norm(v).alias("__n"))
    counts = d3.groupBy(block_col).agg(
        F.ceil(F.count("*") / F.lit(max_block)).cast("int").alias("__nb")
    )
    sized = d3.join(F.broadcast(counts), block_col)
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.col("__nb")).cast("int")
    grid = F.explode(F.sequence(F.lit(0), F.col("__nb") - 1))
    a = sized.select(
        block_col, F.col(id_col).alias("id_a"), F.col("__v").alias("v_a"),
        F.col("__n").alias("__n_a"), bucket.alias("__pa"), grid.alias("__pb"),
    )
    b = sized.select(
        block_col, F.col(id_col).alias("id_b"), F.col("__v").alias("v_b"),
        F.col("__n").alias("__n_b"), grid.alias("__pa"), bucket.alias("__pb"),
    )
    return a.join(b, [block_col, "__pa", "__pb"])


def _pair_cosine() -> Column:
    """Pair score over _blocked_pair_grid output: one dot fold per pair,
    precomputed norms, zero-norm pairs mapped to -2.0 (see cosine)."""
    return F.coalesce(
        F.try_divide(
            _dot(F.col("v_a"), F.col("v_b")), F.col("__n_a") * F.col("__n_b")
        ),
        F.lit(-2.0),
    )


def pairwise_topk_per_label(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_block: int = 4096,
) -> DataFrame:
    """Blocked all-pairs: exact cosine top-k neighbors within each label
    block (IVF-with-given-centroids shape). The self-join shuffles on the
    block key only; per-pair scoring stays in codegen.

    Skew guard (``max_block``): a label with n rows is an n^2 pair block
    that would otherwise land in ONE join partition. Labels larger than
    max_block split into B = ceil(n/max_block) deterministic hash
    sub-buckets and all-pairs run over the B x B bucket-pair grid — the
    a-side replicates each row B times keyed (bucket(a), j), the b-side
    keyed (i, bucket(b)), so every pair meets exactly once in task
    (bucket(a), bucket(b)). This PARTITIONS the pair space (exact results,
    not sampling), bounds per-task memory, and costs B x replication only
    for the oversized labels; when every label fits, B=1 everywhere and
    the plan degenerates to the plain label equi-join."""
    pairs = _blocked_pair_grid(df, label_col, id_col, vec_col, max_block).filter(
        F.col("id_a") != F.col("id_b")
    )
    scored = pairs.select(
        label_col,
        "id_a",
        "id_b",
        F.round(_pair_cosine(), 6).alias("cos_sim"),
    )
    # partition by (label, id): an id appearing under several labels gets
    # top-k PER LABEL, not one merged top-k (review r5)
    w = Window.partitionBy(label_col, "id_a").orderBy(
        F.col("cos_sim").desc(), F.col("id_b").asc()
    )
    return scored.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k).drop("__rk")


# ------------------------------------------------------------------ IVF

def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "cid int, centroid array<double>")


def ivf_train(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train IVF coarse centroids with distributed Lloyd iterations — the
    inverted-file ANN scale path alongside the LSH index (north_star's
    'IVF or LSH-bucketed variant').

    Deterministic throughout (engine determinism contract): init is the
    data-independent pseudo-random hyperplane basis (`_hyperplane`), and
    every iteration is a pure DataFrame computation:

    1. assign: broadcast crossJoin against the (tiny) centroid table,
       ``max_by(cid, struct(sim, -cid))`` per vector — the C scored rows
       per vector collapse MAP-SIDE (partial agg) before any shuffle;
    2. update: ``posexplode`` vectors to (cid, pos, val) and average —
       the shuffle carries only n_centroids x dim rows after map-side
       partial aggregation; new centroids are collected driver-side
       (n_centroids x dim doubles — config-sized, like a prefix table).

    Empty clusters keep their previous centroid. Returns plain lists so
    the result broadcasts as literals or a small DataFrame."""
    spark = df.sparkSession
    centroids = [_hyperplane(dim, 10_000 + c) for c in range(n_centroids)]
    v = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    # declared-dim check (one cheap agg): ragged or wrong-length vectors
    # would otherwise zero-fill centroid tails each iteration and train
    # 'successfully' against silently-wrong geometry (review r5)
    sz = v.agg(
        F.min(F.size("__v")).alias("lo"), F.max(F.size("__v")).alias("hi")
    ).collect()[0]
    if sz["lo"] is not None and (sz["lo"] != dim or sz["hi"] != dim):
        raise ValueError(
            f"ivf_train: vector lengths [{sz['lo']}, {sz['hi']}] != declared dim {dim}"
        )
    for _ in range(n_iters):
        cdf = _centroid_df(spark, centroids)
        # groupBy(__v) collapses identical vectors to ONE group; the crossJoin
        # contributes n_centroids rows per INPUT ROW, so count/n_centroids
        # recovers the row multiplicity and the update below weights by it —
        # true Lloyd on duplicate-heavy corpora (review r4: an unweighted
        # mean drifts centroids away from duplicated boilerplate mass)
        assigned = (
            v.crossJoin(F.broadcast(cdf))
            .select(
                "__v",
                F.struct(
                    cosine(F.col("__v"), F.col("centroid")).alias("sim"),
                    (-F.col("cid")).alias("ncid"),
                ).alias("key"),
                "cid",
            )
            .groupBy("__v")
            .agg(
                F.max_by("cid", F.col("key")).alias("cid"),
                (F.count("*") / n_centroids).cast("double").alias("__w"),
            )
        )
        sums = (
            assigned.select("cid", "__w", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg((F.sum(F.col("val") * F.col("__w")) / F.sum("__w")).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cid[c].get(j, 0.0) for j in range(dim)] if c in by_cid else centroids[c]
            for c in range(n_centroids)
        ]
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stamp each vector with its nearest-centroid cluster id (``__cid``)
    — broadcast crossJoin + map-side-combining ``max_by`` keyed on
    ``id_col`` alone (review r4: grouping on every column would collapse
    duplicate rows out of the index and break on non-groupable column
    types like maps), then a NULL-SAFE equi-join back that preserves
    every input row and column (a NULL id row would vanish through a
    plain equi-join). ``id_col`` must uniquely identify a vector — rows
    sharing an id share one cluster assignment. The result is the
    in-memory inverted file; write it ``partitionBy('__cid')`` for the
    partition-pruned disk layout (ivf_write_index)."""
    spark = df.sparkSession
    cdf = _centroid_df(spark, centroids)
    v = F.col(vec_col).cast("array<double>")
    assignment = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cdf))
        .select(
            id_col,
            F.struct(
                cosine(v, F.col("centroid")).alias("sim"),
                (-F.col("cid")).alias("ncid"),
            ).alias("__key"),
            "cid",
        )
        .groupBy(id_col)
        .agg(F.max_by("cid", F.col("__key")).alias("__cid"))
    ).withColumnRenamed(id_col, "__aid")
    return (
        df.join(assignment, F.col(id_col).eqNullSafe(F.col("__aid")), "left")
        .drop("__aid")
    )


def _probe_cids(centroids: list[list[float]], query_vec: list[float], n_probes: int) -> list[int]:
    import builtins

    def cos(a, b):
        d = builtins.sum(x * y for x, y in zip(a, b))
        na = builtins.sum(x * x for x in a) ** 0.5
        nb = builtins.sum(y * y for y in b) ** 0.5
        return d / (na * nb) if na and nb else -2.0

    scored = sorted(
        ((cos(c, query_vec), -i) for i, c in enumerate(centroids)), reverse=True
    )
    return [-ni for _s, ni in scored[:n_probes]]


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF search: rank the query against the (driver-side, tiny) centroid
    table, scan ONLY the ``n_probes`` nearest clusters, exact-rank the
    survivors. With a ``partitionBy('__cid')`` parquet layout the isin
    filter becomes partition pruning — the 10^9-vector read path; probing
    ALL clusters recovers exact brute-force ranking."""
    probes = _probe_cids(centroids, query_vec, n_probes)
    cand = assigned.filter(F.col("__cid").isin(probes)).drop("__cid")
    return brute_force_topk(cand, query_vec, k, id_col, vec_col, round_digits)


def ivf_write_index(
    assigned: DataFrame, path: str, centroids: list[list[float]], dim: int
) -> None:
    """Materialize the inverted file: parquet PARTITIONED BY cluster id +
    a sidecar with the trained centroids (the index is self-describing,
    mirroring build_ann_index's metadata contract). The sidecar is written
    through the Hadoop FS API so index path and metadata share one
    filesystem on non-local deployments (ADVICE r4)."""
    assigned.write.mode("overwrite").partitionBy("__cid").parquet(path)
    import json

    from ..fsio import write_text_file

    write_text_file(
        assigned.sparkSession,
        path.rstrip("/") + "/_ivf_meta.json",
        json.dumps({"dim": dim, "centroids": centroids}),
    )


def query_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized inverted file: nearest ``n_probes`` clusters
    from the sidecar centroids, partition-pruned scan, exact rank."""
    import json

    from ..fsio import read_text_file

    meta = json.loads(read_text_file(spark, path.rstrip("/") + "/_ivf_meta.json"))
    if meta["dim"] != len(query_vec):
        raise ValueError(f"query dim {len(query_vec)} != index dim {meta['dim']}")
    assigned = spark.read.parquet(path)
    return ivf_topk(assigned, meta["centroids"], query_vec, k, n_probes, id_col, vec_col)
