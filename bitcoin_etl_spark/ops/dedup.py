"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every operator avoids the pairwise cross product — the
only joins are equi-joins on hashes/buckets/signatures, so shuffle
volume is O(docs × signature width), never O(docs²). Candidate
verification (exact Jaccard) happens only on LSH-bucketed candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import fingerprint, tokenize


def _h32(col, seed: int):
    """Deterministic 32-bit hash from md5 (engine-portable: the same
    value is computable in DuckDB for oracles)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                prefix_tokens: int | None = None) -> DataFrame:
    """Exact (or prefix-fingerprint) dedup: one row per fingerprint,
    keep-min id; map-side partial agg handles duplicate-heavy skew."""
    f = fingerprint(F.col(text_col), prefix_tokens)
    return (
        df.withColumn("fingerprint", f)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def _shingles(text_col: str, k: int = 3):
    ws = tokenize(F.col(text_col))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j) for j in range(k)]
        ),
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """MinHash signature per doc: explode shingles once, take min of
    ``n_hashes`` independent 32-bit hashes. One shuffle (groupBy id),
    partial-aggregated map-side."""
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_k)).alias("sh")
    )
    aggs = [F.min(_h32(F.col("sh"), s)).alias(f"h{s}") for s in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        n_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Band the signature (bands × rows), equi-join per band bucket,
    union + distinct. Equi-join on (band, bucket-hash) only — the classic
    LSH shuffle shape that survives 100 TB."""
    rows = n_hashes // bands
    pieces = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        bucket = F.xxhash64(*cols)
        pieces.append(
            sig.select(F.col(id_col), F.lit(b).alias("band"),
                       bucket.alias("bucket"))
        )
    banded = pieces[0]
    for p in pieces[1:]:
        banded = banded.unionByName(p)
    a = banded.alias("a")
    b_ = banded.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    return pairs.distinct()


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """SimHash: per-token 32-bit hash; the fingerprint's bit *b* is the
    majority vote of token-hash bit *b*. Implemented as explode(token) ×
    explode(bit) → signed vote sum → bit reassembly — three narrow ops
    and one partial-agg shuffle; no UDFs."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).withColumn("th", _h32(F.col("tok"), 0))
    votes = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        F.col("th"),
    ).withColumn(
        "vote",
        F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1),
    )
    bitsum = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return bitsum.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, CAST(bit AS INT))"))
            .otherwise(0)
        ).alias("simhash")
    )


def hamming_near_pairs(sim: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3, prefix_bits: int = 16) -> DataFrame:
    """Near-dup candidates by SimHash: bucket on the high ``prefix_bits``
    (pigeonhole — identical prefix is necessary for small distance when
    differences concentrate in low bits), verify Hamming distance via
    bit_count on the XOR. Equi-join on prefix only."""
    with_p = sim.withColumn(
        "p", F.shiftright(F.col("simhash"), 32 - prefix_bits)
    )
    a, b = with_p.alias("a"), with_p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )


def ngram_jaccard_pairs(df: DataFrame, candidates: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3,
                        min_jaccard: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard verification over candidate pairs only:
    |A∩B| via a shingle equi-join restricted to candidates, |A∪B| from
    per-doc distinct counts. Never materializes the cross product."""
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_k)).alias("sh")
    ).distinct()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.toDF("id_a", "sh")
    b = sh.toDF("id_b", "sh")
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
