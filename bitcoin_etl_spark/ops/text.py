"""Text analysis operators: tokenization, quality scoring, language-ID
heuristic, document fingerprinting. Pure Column expressions — they run
inside whole-stage codegen, no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
TOKEN_SPLIT_RE = r"[\s]+"
# BPE-ish boundary: split on whitespace AND punctuation boundaries,
# keeping word/number runs — the cheap stand-in for a real BPE pass.
BPE_ISH_RE = r"[^\w]+"


def tokenize(text: Column, pattern: str = TOKEN_SPLIT_RE) -> Column:
    return F.split(F.trim(text), pattern)


def quality_stats(df: DataFrame, text_col: str = "text",
                  stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> DataFrame:
    """Per-doc quality signals as raw counts: token count, distinct
    tokens, stopword hits, char count, mean-token-length numerator
    (ratios left to the caller — see plans.queries conventions)."""
    toks = tokenize(F.col(text_col))
    return df.withColumn("n_tok", F.size(toks)).withColumn(
        "n_stop", F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    ).withColumn("n_chars", F.length(text_col)).withColumn(
        "sum_tok_len",
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)),
    )


def langid_scores(df: DataFrame, text_col: str = "text",
                  stopword_sets: dict[str, tuple[str, ...]] | None = None
                  ) -> DataFrame:
    """Stopword-density language scores, one column per language; the
    argmax is the predicted language. N-gram-heuristic class."""
    sets = stopword_sets or {
        "en": DEFAULT_STOPWORDS,
        "es": ("el", "la", "de", "que", "y", "en"),
        "fr": ("le", "la", "de", "et", "un", "en"),
    }
    toks = tokenize(F.lower(F.col(text_col)))
    out = df
    score_cols = []
    for lang, words in sets.items():
        c = f"score_{lang}"
        out = out.withColumn(
            c, F.size(F.filter(toks, lambda t: t.isin(*words)))
        )
        score_cols.append(c)
    pred = F.greatest(*[F.col(c) for c in score_cols])
    lang_expr = None
    for lang in sets:
        cond = F.col(f"score_{lang}") == pred
        lang_expr = F.when(cond, lang) if lang_expr is None else lang_expr.when(cond, lang)
    return out.withColumn("predicted_lang", lang_expr)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition signals (the Gopher-rules repetition
    family, Rae et al. 2021 §A1.1): per doc, the occurrence count of
    the most frequent word 2-gram and the duplicated-3-gram counts —
    the filters that catch boilerplate/keyword-stuffed pages that
    per-token quality stats miss. Emitted as raw counts (ratio =
    top2_count/n_2grams etc. left to the caller, per registry
    conventions). Shape: explode word n-grams → (doc, gram) partial-agg
    → per-doc agg — two map-side-combining shuffles both partitioned by
    doc_id, no windows, no skew hazard beyond a pathological single doc
    (bounded by doc length, not corpus size)."""
    from .dedup import _shingles_of, _spread, _tokens_frame

    # spread before the two n-gram explodes: a single-row-group corpus
    # file otherwise pins both gram pipelines to the scan's task count
    # (same rationale as the dedup operators' _spread)
    df = _spread(df, id_col)
    base = df.select(F.col(id_col))
    toks = _tokens_frame(df, text_col, id_col)

    def per_doc(k: int, tag: str) -> DataFrame:
        grams = toks.select(
            F.col(id_col), F.explode(_shingles_of(F.col("_ws"), k)).alias("g")
        )
        freq = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
        return freq.groupBy(id_col).agg(
            F.sum("c").cast("long").alias(f"n_{tag}"),
            F.count("*").cast("long").alias(f"uniq_{tag}"),
            F.max("c").cast("long").alias(f"top_{tag}"),
        )

    out = base.join(per_doc(2, "gram2"), id_col, "left").join(
        per_doc(3, "gram3"), id_col, "left"
    )
    return out.select(
        id_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_gram2", "uniq_gram2", "top_gram2",
                      "n_gram3", "uniq_gram3", "top_gram3")
        ],
    )


def kgram_hashes(text: Column, k: int = 8) -> Column:
    """32-bit hash of the character k-gram at every position of ``text``,
    as ``array<long>``. Classic implementations compute this with a
    Rabin-Karp ROLLING hash (O(1) per position); here each position goes
    through the vectorized md5 kernel instead — same selection
    semantics, stays JVM-side, and is identically computable in a SQL
    oracle (``substr(md5(..),1,8)``). A corpus where per-position md5
    ever dominates can swap in a numpy rolling hash via ``mapInPandas``
    without touching the winnow step.

    CALLER CONTRACT: pass an already-normalized (lowercased) ATTRIBUTE,
    not a nested expression — anything passed here is inlined into the
    per-position lambda and re-evaluated ~length(text) times per row
    (an embedded `lower(text)` alone measured ~40 ms/doc; a thread dump
    showed the executor living inside UTF8String.toLowerCaseAscii).
    `winnow_fingerprints` materializes the normalized string in its own
    projection for exactly this reason."""
    s = text
    n = F.length(s) - (k - 1)
    # guard: sequence(1, n) RUNS BACKWARDS for n <= 0 in Spark
    grams = F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.substring(s, i, F.lit(k))),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    )


def winnow(hashes: Column, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): slide a window of ``w`` consecutive k-gram hashes and
    keep the minimum of each window; the distinct selected hashes are
    the document's fingerprints. Guarantee: any shared substring of
    length >= k + w - 1 between two documents yields at least one shared
    fingerprint, while only ~2/(w+1) of positions are kept. Pure Column
    expression — a narrow map with NO shuffle, so fingerprinting 100 TB
    is embarrassingly parallel; downstream fingerprint equi-joins are
    the only shuffles."""
    m = F.size(hashes) - (w - 1)
    sel = F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), m),
                    lambda i: F.array_min(F.slice(hashes, i, w))),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    return F.array_sort(F.array_distinct(sel))


def _winnow_batches(k: int, w: int, id_col: str, text_col: str):
    """mapInPandas body for the Arrow fingerprint path: per batch, the
    per-position md5 runs through hashlib on raw bytes and the sliding
    window minimum through one vectorized numpy pass — bit-identical to
    the Column-expression path (`kgram_hashes` + `winnow`), pinned by
    test_winnow_arrow_matches_expressions. Construction cost (numpy
    import) is paid once per task, before the batch loop."""
    import hashlib

    import numpy as np
    import pandas as pd

    def fn(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, ngs, fpss = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = (text or "").lower()
                n = len(s) - (k - 1)
                if n < 1:
                    ids.append(did)
                    ngs.append(0)
                    fpss.append([])
                    continue
                b = s.encode("utf-8")
                md5 = hashlib.md5
                if len(b) == len(s):
                    # ASCII: byte slices == char slices; bulk-convert
                    # all 4-byte digest prefixes in one frombuffer
                    hs = np.frombuffer(
                        b"".join(
                            md5(b[i:i + k]).digest()[:4]
                            for i in range(n)
                        ),
                        dtype=">u4",
                    ).astype(np.int64)
                else:
                    # non-ASCII: slice by code point exactly like
                    # Spark's substring, encode each gram
                    hs = np.frombuffer(
                        b"".join(
                            md5(s[i:i + k].encode("utf-8")).digest()[:4]
                            for i in range(n)
                        ),
                        dtype=">u4",
                    ).astype(np.int64)
                m = n - (w - 1)
                if m < 1:
                    sel = []
                else:
                    sel = np.unique(
                        sliding_window_view(hs, w).min(axis=1)
                    ).tolist()
                ids.append(did)
                ngs.append(n)
                fpss.append(sel)
            yield pd.DataFrame(
                {id_col: ids, "n_grams": ngs, "fps": fpss}
            )

    return fn


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        w: int = 4, use_arrow: bool = True) -> DataFrame:
    """Per-doc winnowing fingerprints: (id, n_grams, fps array<long>).
    The plagiarism-detection / near-dup primitive — explode ``fps`` and
    equi-join on the hash to find documents sharing >= k+w-1 chars.

    Two equivalent execution paths (selection is the documented
    `kgram_hashes` seam — per-position md5 dominates there):

    ``use_arrow=True`` (default): one ``mapInPandas`` over (id, text)
    only — hashlib md5 per gram + one vectorized numpy sliding-window
    min per doc. Measured 3.2x the expression path at sf1.0 (1.3 s vs
    4.1 s), bit-identical output (test-pinned). The input is spread to
    cluster parallelism first (same rationale as the dedup operators'
    `_spread`: a single-row-group corpus file would otherwise pin the
    whole Python stage to one task).

    ``use_arrow=False``: pure Column expressions (`kgram_hashes` +
    `winnow`) — codegen'd, no Python workers; the oracle-portable
    reference formulation. Every expensive intermediate gets its OWN
    projection: the lowered text before hashing (an inlined `lower()`
    re-runs per k-gram position — measured ~40 ms/doc of pure
    toLowerCase), and the hash array before the window pass (an inlined
    hash tree re-runs per window — measured ~80x at k=32). Referenced
    more than once and non-cheap, each alias survives CollapseProject,
    so per row the text lowers once, hashes once, and the sliding
    windows read attributes."""
    if use_arrow and not df.isStreaming:
        from pyspark.sql import types as T

        from .dedup import _spread

        id_type = df.schema[id_col].dataType
        schema = T.StructType([
            T.StructField(id_col, id_type),
            T.StructField("n_grams", T.LongType()),
            T.StructField("fps", T.ArrayType(T.LongType())),
        ])
        # project to the two needed columns BEFORE the Python boundary
        # (opaque functions defeat column pruning otherwise)
        src = _spread(df, id_col).select(F.col(id_col), F.col(text_col))
        return src.mapInPandas(
            _winnow_batches(k, w, id_col, text_col), schema
        )
    sdf = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_s")
    )
    hdf = sdf.select(
        F.col(id_col), kgram_hashes(F.col("_s"), k).alias("_h")
    )
    return hdf.select(
        F.col(id_col),
        F.size("_h").cast("long").alias("n_grams"),
        winnow(F.col("_h"), w).alias("fps"),
    )


def fingerprint(text: Column, prefix_tokens: int | None = None) -> Column:
    """Deterministic document fingerprint: md5 over the (optionally
    prefix-truncated) token stream — the content-hash PK used by exact
    dedup (the item_id-for-content analog of P13)."""
    toks = tokenize(text)
    if prefix_tokens:
        toks = F.slice(toks, 1, prefix_tokens)
    return F.md5(F.concat_ws(" ", toks))
