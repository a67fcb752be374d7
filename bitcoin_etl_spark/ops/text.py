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


def fingerprint(text: Column, prefix_tokens: int | None = None) -> Column:
    """Deterministic document fingerprint: md5 over the (optionally
    prefix-truncated) token stream — the content-hash PK used by exact
    dedup (the item_id-for-content analog of P13)."""
    toks = tokenize(text)
    if prefix_tokens:
        toks = F.slice(toks, 1, prefix_tokens)
    return F.md5(F.concat_ws(" ", toks))
