"""Training-data pipeline operators (the 100 TB-pipeline additions the
graft brief mandates beyond reference parity): deduplication families,
similarity search, text analysis, multimodal column plumbing.

All operators are DataFrame/Column compositions (JVM-side, codegen'd);
Python appears only as Arrow-batched pandas UDFs in the multimodal
decode stubs. Several are also exposed as oracle-checked queries in
``plans.queries``.
"""

from .text import tokenize, quality_stats, langid_scores, fingerprint  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from .similarity import cosine_topk, embedding_near_dup_pairs  # noqa: F401
