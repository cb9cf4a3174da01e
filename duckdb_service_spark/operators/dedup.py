"""Deduplication operator family (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine) — the training-data-pipeline extensions that the
reference (a SQL passthrough service) lacks, built Spark-first.

Algorithms are the published classics: MinHash resemblance sketching
(Broder, "On the resemblance and containment of documents", 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3);
SimHash (Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002) as deployed for web near-dup detection
(Manku/Jain/Sarma, WWW 2007).

Scale design notes (the part that matters at 100 TB):
- Everything is expression-level (no Python UDFs): hashing is md5 (portable,
  functions.portable), shingling is split/transform/slice, signatures are 64
  aggregate columns over one explode — per-doc cost is linear, the only
  shuffles are groupBy(doc) and the band self-join.
- LSH candidate generation joins on (band_id, band_hash): with b bands the
  join key space is huge, so the shuffle is uniform unless many true
  near-dups share a band — exactly the rows we want colocated anyway.
- The exact-Jaccard verification join runs only on LSH candidates, never on
  all pairs (candidate count ≈ O(dups), not O(n²)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import hash64

MINHASH_PRIME = 2147483647  # 2^31 - 1; keeps a*h+b inside int64


def perm_coeffs(i: int) -> tuple[int, int]:
    """Deterministic permutation coefficients, identical formula in the
    DuckDB oracle SQL (plans/dedup.py) — LCG-style, never 0 mod p."""
    a = (1103515245 * (i + 1) + 12345) % MINHASH_PRIME
    b = (69069 * (i + 1) + 362437) % MINHASH_PRIME
    return (a or 1, b)


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens_expr(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


# --- SQL-text twins of the expression builders (r15 plan-build cost) -------
#
# Building the MinHash topology out of pyspark Column objects costs the
# DRIVER seconds before a single task runs: every functions.* call is a py4j
# round trip and every higher-order-function lambda constructs a JVM lambda
# via several more (measured: minhash_sig_cols alone 2.2s warm, the whole
# dedup_minhash_lsh plan build 2.8s at 64 perms). The SQL-text twins below
# produce the IDENTICAL resolved expressions (asserted via
# DataFrame.sameSemantics in tests/test_dedup_expr_sql.py) through ONE
# F.expr parse each — the parse runs in the JVM's SQL parser, so the py4j
# chatter collapses to one call per column. At 100 TB this is pure driver
# planning latency (guide §7.3), the same lesson as huge expression trees.

def _tokens_sql(col: str) -> str:
    return f"split(trim(lower({col})), '\\\\s+')"


def _shingles_sql(col: str, n: int = 3) -> str:
    toks = _tokens_sql(col)
    return (
        f"array_distinct(CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END)"
    )


def _hash64_sql(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def ngrams_expr(col: Column, n: int) -> Column:
    """ALL word n-grams in order, multiplicity preserved (repetition stats
    need counts; shingles_expr dedups for set semantics). Guarded for docs
    shorter than n tokens: Spark's sequence(1, 0) DESCENDS ([1, 0]) and
    index 0 then crashes slice, so short docs get an explicit empty array."""
    toks = tokens_expr(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_expr(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (pure expressions —
    whole-stage codegen, no UDF)."""
    return F.array_distinct(ngrams_expr(col, n))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized text: keep the smallest id per content
    hash. One shuffle on the 128-bit content hash; at 100 TB this is the
    cheapest possible dedup (hash-groupBy, map-side partial min)."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return df.select(h, F.col(id_col)).groupBy("content_hash").agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def explode_shingles(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3) -> DataFrame:
    """(id, s): one row per distinct shingle per doc, with the shingle stored
    as its portable 60-bit hash (bigint), NOT the raw n-gram string. Compute
    ONCE and share (localCheckpoint) across signature + verification stages —
    the shingle relation is the expensive subtree of every near-dup pipeline,
    it gets materialized and re-joined up to 3×, and long keys store, shuffle
    and compare far cheaper than n-gram strings. The md5 count is unchanged
    (it moves from the signature stage to before the checkpoint); Jaccard
    intersection over 60-bit hashes equals string intersection up to a
    ~2^-60-per-pair collision, the standard trade (MMDS ch.3 hashes shingles
    to ints for exactly this reason)."""
    return df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), shingle_n)).alias("__s_raw")
    ).select(F.col(id_col), hash64(F.col("__s_raw")).alias("s"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perms: int = 64,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    with_size: bool = False,
) -> DataFrame:
    """(id, mh0..mh{k-1}): k-permutation MinHash signature per document.

    One explode of distinct shingles, then k min-aggregates in a single
    groupBy — NOT k passes and NOT a k× row blow-up. h is the portable
    md5-based 64-bit hash reduced mod 2^31-1. Pass a pre-computed
    ``shingles`` (from explode_shingles) to share the scan.

    ``with_size=True`` adds ``n_sh`` (distinct-shingle count) to the SAME
    aggregate: the downstream Jaccard verification needs per-doc set sizes,
    and riding them on the signature groupBy is free, where a separate
    count-aggregate would re-shuffle the whole shingle relation (it showed
    up as 2 extra Exchanges + 2 checkpoint rescans in the executed plan).
    """
    sh0 = shingles if shingles is not None else explode_shingles(df, id_col, text_col, shingle_n)
    # explode_shingles already emits the portable 60-bit hash as `s`
    sh = sh0.select(id_col, (F.col("s") % MINHASH_PRIME).alias("h"))
    aggs = []
    for i in range(num_perms):
        a, b = perm_coeffs(i)
        # F.expr, not Column arithmetic: one parse per slot instead of ~6
        # py4j round trips (same resolved expression)
        aggs.append(
            F.expr(f"min(({a} * h + {b}) % {MINHASH_PRIME})").alias(f"mh{i}")
        )
    if with_size:
        aggs.append(F.count(F.lit(1)).alias("n_sh"))
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str, num_perms: int = 64, bands: int = 16) -> DataFrame:
    """(id, band_id, band_hash): hash each r-row band of the signature.
    Equal band_hash within a band_id ⇒ candidate pair."""
    rows_per_band = num_perms // bands
    band_structs = []
    for b in range(bands):
        cols = ", ".join(f"mh{b * rows_per_band + j}" for j in range(rows_per_band))
        band_structs.append(
            f"named_struct('band_id', {b}, 'band_hash', md5(concat_ws(',', {cols})))"
        )
    # one F.expr parse for the whole explode(array(struct...)) tree — the 16
    # Column-built structs cost ~0.5s of py4j round trips per plan build
    bands_expr = F.expr(f"explode(array({', '.join(band_structs)}))")
    return sig.select(
        id_col, bands_expr.alias("band")
    ).select(id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str, max_bucket: "int | None" = None
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    Bucket PRE-AGGREGATION instead of a self-join (VERDICT r06 task 5):
    group the bands relation once by (band_id, band_hash) into a sorted id
    array, then emit each bucket's pairs MAP-SIDE from the array. The old
    shape shuffled the full bands relation twice (both self-join sides)
    and joined; this shape shuffles it once (the groupBy, with map-side
    partial aggregation) and the quadratic pair expansion happens inside
    one codegen stage with no further exchange. Singleton buckets — the
    overwhelming majority at any scale — die in the size filter BEFORE
    any pair exists, instead of flowing through the join probe.

    ``max_bucket`` caps the per-bucket id list (keeping the LOWEST ids —
    deterministic) for adversarial mega-buckets (e.g. boilerplate shingle
    sets at 100 TB: a 1M-doc bucket would emit 5e11 pairs in one task);
    callers that cap should count+log oversized buckets. Default None = no
    cap, exact semantics (the oracle-checked path)."""
    ids = F.array_sort(F.collect_set(F.col(id_col)))
    buckets = (
        bands_df.groupBy("band_id", "band_hash")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.withColumn("ids", F.slice("ids", 1, max_bucket))
    # one F.expr parse (identical resolved tree to the nested-lambda Column
    # form it replaces — r15 plan-build cost; see test_sqltext_builders_r15)
    pair_arr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('id_a', x, 'id_b', y))))"
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only.

    Pass ``sizes`` (id, n_sh) — e.g. from ``minhash_signatures(...,
    with_size=True)`` — to reuse an already-materialized per-doc count
    instead of re-aggregating the shingle relation twice (na/nb sides).
    """
    sh0 = shingles if shingles is not None else explode_shingles(docs, id_col, text_col, shingle_n)
    sh = sh0.select(F.col(id_col).alias("__id"), "s")
    if sizes is not None:
        sizes = sizes.select(F.col(id_col).alias("__id"), "n_sh")
    else:
        sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("__id").alias("id_a"), F.col("s"))
    sh_b = sh.select(F.col("__id").alias("id_b"), F.col("s"))
    inter = (
        pairs.join(sh_a, "id_a").join(sh_b, ["id_b", "s"]).groupBy("id_a", "id_b").agg(
            F.count(F.lit(1)).alias("n_inter")
        )
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def doc_shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, sh_arr, n_sh): per-doc array of distinct-shingle 60-bit hashes
    plus its size — the COMPACT per-doc form of explode_shingles.

    Why arrays instead of an exploded relation: every downstream consumer
    (signatures, Jaccard verification) is per-doc, so keeping shingles as
    one array row per document lets the whole MinHash signature run as a
    narrow projection (zero shuffle, whole-stage codegen) and verification
    as an ``array_intersect`` expression over candidate pairs. At 100 TB
    this removes the two largest shuffles of the exploded topology: the
    signature groupBy (full shingle relation through an Exchange) and the
    shingle-side joins of the verification step. Same 2^-60-per-pair
    hash-collision trade as explode_shingles (distinct is taken on the
    n-gram STRINGS, then hashed — identical to the exploded path and the
    DuckDB oracle formula)."""
    # Two-step select so CollapseProject doesn't duplicate the (expensive)
    # shingle transform into the size() expression.
    return df.select(F.col(id_col), shingle_hash_arr(text_col, shingle_n).alias("sh_arr")).select(
        id_col, "sh_arr", F.size("sh_arr").alias("n_sh")
    )


def shingle_hash_arr(text_col: str, shingle_n: int = 3) -> Column:
    """Array of distinct-shingle 60-bit hashes of ``text_col`` (by name) —
    the map-side core of doc_shingle_arrays, exposed for plans that ride
    extra columns on the same cached projection. One F.expr parse."""
    return F.expr(
        f"transform({_shingles_sql(text_col, shingle_n)}, s -> {_hash64_sql('s')})"
    )


def minhash_sig_cols(arr: "Column | str", num_perms: int = 64) -> list[Column]:
    """mh0..mh{k-1} as PER-ROW expressions over a shingle-hash array: each
    signature slot is ``array_min(transform(arr, s -> (a*(s mod p)+b) mod
    p))``. Bit-identical to minhash_signatures' aggregate form (min over the
    same value set) but needs NO explode, NO groupBy and NO Exchange — the
    signature is computed map-side inside one codegen stage, which is the
    shape that survives 100 TB (signature cost scales with data, shuffle
    cost stays zero). (r10 probed an allocation-free ``aggregate`` fold
    per slot; interleaved A/B at sf0.1 showed no win — codegen already
    keeps the transform's scratch array cheap — so the simpler form
    stays.)

    Pass ``arr`` as a column NAME (str) to build each slot through one
    F.expr parse — the Column/lambda form costs ~2.2s of py4j round trips
    per plan build at 64 perms (r15; resolved expressions identical,
    asserted by sameSemantics in tests)."""
    if isinstance(arr, str):
        return [
            F.expr(
                f"array_min(transform({arr}, s -> "
                f"({a} * (s % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME}))"
            ).alias(f"mh{i}")
            for i, (a, b) in ((i, perm_coeffs(i)) for i in range(num_perms))
        ]

    def _perm(a: int, b: int):
        # closure factory, NOT lambda-with-default-args: PySpark counts a
        # Python lambda's parameters (defaults included) to pick the HOF
        # arity, so `lambda s, a=a, b=b` would request a 3-arg transform.
        return lambda s: (F.lit(a) * (s % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME

    cols = []
    for i in range(num_perms):
        a, b = perm_coeffs(i)
        cols.append(F.array_min(F.transform(arr, _perm(a, b))).alias(f"mh{i}"))
    return cols


def minhash_sig_arr(arr_col: str, num_perms: int = 64) -> Column:
    """The whole MinHash signature as ONE ARRAY<BIGINT> column:
    ``transform(<literal (a,b) array>, p -> array_min(transform(arr, ...)))``.

    Slot values are identical to minhash_sig_cols' mh0..mh{k-1} (same
    per-slot arithmetic, asserted in tests), but the expression tree is
    ~64x smaller — which cuts DRIVER cost everywhere the tree travels:
    plan build, analysis, every AQE re-optimization between stages, and
    whole-stage codegen size. Measured r15 at sf0.1: the 64-column form
    spent 500-660ms of driver time in inter-stage gaps re-optimizing the
    wide signature projection; the array form runs the same pipeline
    ~12-19% faster end to end. At 100 TB driver planning latency is per
    QUERY, not per task — it never amortizes, so tree size matters."""
    coeffs = ", ".join(
        f"named_struct('a', {a}, 'b', {b})"
        for a, b in (perm_coeffs(i) for i in range(num_perms))
    )
    # LET-BINDING, load-bearing: ``transform(array(X), v -> body)[0]``
    # evaluates X once per row and binds it. Referencing {arr_col}
    # directly inside the permutation lambda re-evaluates whatever
    # expression Catalyst collapsed into it ONCE PER PERMUTATION —
    # CollapseProject counts textual references, not per-element lambda
    # evaluations, so an un-materialized shingle pipeline (e.g. the
    # streaming twin, which cannot persist) was recomputed 64x per row:
    # measured 7.2s -> 42.9s on stream_neardup_lsh at sf0.001 before the
    # binding, back to ~6s with it.
    return F.expr(
        f"transform(array({arr_col}), __sh -> "
        f"transform(array({coeffs}), p -> "
        f"array_min(transform(__sh, s -> "
        f"(p.a * (s % {MINHASH_PRIME}) + p.b) % {MINHASH_PRIME}))))[0]"
    )


def lsh_bands_arr(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    num_perms: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band_id, band_hash) from an array-form signature column —
    band_hash = md5 of the comma-joined band slots, byte-identical to
    lsh_bands' concat_ws form (bigint->string cast is the same text)."""
    rows_per_band = num_perms // bands
    # same let-binding as minhash_sig_arr: bind the signature once per
    # row, or a collapsed sig expression re-evaluates once per band
    bands_expr = (
        f"explode(transform(array({sig_col}), __sig -> "
        f"transform(sequence(0, {bands - 1}), b -> "
        f"named_struct('band_id', b, 'band_hash', "
        f"md5(array_join(transform(slice(__sig, b * {rows_per_band} + 1, "
        f"{rows_per_band}), x -> cast(x as string)), ',')))))[0])"
    )
    return sig_df.select(
        id_col, F.expr(bands_expr).alias("band")
    ).select(
        id_col,
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )


def jaccard_pairs_from_arrays(
    pairs: DataFrame, per_doc: DataFrame, id_col: str
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs from per-doc hash
    arrays: two id-equi joins (the candidate side is O(dups) and broadcasts
    at any realistic dup rate) and one ``array_intersect`` per pair — no
    exploded shingle relation, no per-pair groupBy. Equal to the exploded
    join-count form absent 60-bit collisions (arrays hold hashes of
    DISTINCT shingle strings, so intersect-then-size == join-then-count)."""
    a = per_doc.select(
        F.col(id_col).alias("id_a"), F.col("sh_arr").alias("__a"), F.col("n_sh").alias("__na")
    )
    b = per_doc.select(
        F.col(id_col).alias("id_b"), F.col("sh_arr").alias("__b"), F.col("n_sh").alias("__nb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__ni", F.size(F.array_intersect("__a", "__b")))
        .select(
            "id_a",
            "id_b",
            (F.col("__ni") / (F.col("__na") + F.col("__nb") - F.col("__ni"))).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash): classic sign-of-weighted-bit-sums fingerprint over
    token hashes. 32 bits keeps the result an exact int in both engines
    (the oracle mirrors the formula).

    PER-ROW fold form (r16, VERDICT r15 task 6 — the minhash_sig_arr
    recipe): the token-hash array is bound once per row (let-binding,
    r15 finding 3) and the ``bits`` sign-sums fold over it inside one
    projection — zero explode, zero groupBy, zero Exchange, and the
    expression tree the driver re-optimizes is one compact HOF instead of
    32 aggregate columns + a 32-term recompose. The old exploded
    aggregate form produced one row per TOKEN through a hash aggregate;
    values are identical (same hash, same sums, same sign recompose —
    asserted against the legacy form in tests/test_simhash_fold_r16.py)
    and the noop-sink A/B reads 0.38s->0.22s at sf0.01, 0.30s->0.23s at
    sf0.1. Docs with NULL text produced no aggregate row via explode;
    the isNotNull filter keeps that contract."""
    toks = _tokens_sql(text_col)
    h_arr = f"transform({toks}, __t -> {_hash64_sql('__t')})"
    expr = (
        f"transform(array({h_arr}), __h -> "
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(sacc, j) -> sacc + IF(aggregate(__h, CAST(0 AS BIGINT), "
        f"(acc, h) -> acc + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0, "
        f"shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))))[0]"
    )
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.expr(expr).alias("simhash")
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
