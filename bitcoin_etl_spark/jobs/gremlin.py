"""Gremlin/JanusGraph statement stream — the second graph-DSL variant of
the J8 key-lookup upsert (the nGQL variant lives in ``jobs/graph.py``).

Reproduces the reference's JanusGraph upsert shapes as one-statement-per
-row Gremlin strings built executor-side with Column expressions only:

* vertex upsert: ``g.V().has(label, key, v).fold().coalesce(unfold(),
  addV(label).property(key, v)).property(p1, x1)….iterate()`` — create
  if missing by the key property, then overwrite the payload properties
  (reference janusGraph/janus_etl_partition_by_partition.py:173-185).
* edge upsert: resolve both endpoints by key-property lookup, then
  ``coalesce(existing edge, addE(label))`` so re-running a partition is
  idempotent (reference janus_etl_partition_by_partition.py:360-391).

Null payload properties are OMITTED from the statement — Gremlin's
``property(k, null)`` throws — mirroring the reference's
``if (x != null) { …property(...) }`` guards (line 356-357). Execution
against a real server needs ``gremlinpython``/a ws endpoint absent from
this sandbox; the statement stream is the offline-testable surface, fed
to ``foreachPartition`` submitters exactly like the nGQL one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _gq(col) -> Column:
    """Escape + double-quote a string value for a Groovy/Gremlin script
    (statement stream is one-per-line: control chars escaped/dropped)."""
    s = F.regexp_replace(col.cast("string"), r'(["\\$])', r"\\$1")
    s = F.regexp_replace(s, r"\n", r"\\n")
    s = F.regexp_replace(s, r"\r", r"\\r")
    s = F.regexp_replace(s, r"\t", r"\\t")
    s = F.regexp_replace(s, r"[\x00-\x1F]", "")
    return F.concat(F.lit('"'), s, F.lit('"'))


def _gval(col, dtype: str) -> Column:
    """Render one typed value as a Groovy literal (NULL → SQL null,
    handled by callers via omission)."""
    if dtype == "string":
        return _gq(col)
    if dtype == "boolean":
        return F.when(col, "true").when(~col, "false")
    if dtype == "long":
        return F.concat(col.cast("string"), F.lit("L"))
    if dtype == "double":
        return F.concat(col.cast("double").cast("string"), F.lit("d"))
    if dtype == "datetime":  # epoch seconds → java.util.Date (ms)
        return F.concat(
            F.lit("new Date("),
            (col.cast("long") * 1000).cast("string"),
            F.lit("L)"),
        )
    return col.cast("string")  # int and friends


def _prop(name: str, col, dtype: str) -> Column:
    """``.property('name', value)`` fragment, empty when value is null
    (the reference's ``if (x != null)`` guard, collapsed per-row)."""
    frag = F.concat(
        F.lit(f".property('{name}', "), _gval(col, dtype), F.lit(")")
    )
    return F.coalesce(frag, F.lit(""))


def gremlin_vertex_statements(df: DataFrame, label: str, key_prop: str,
                              props: dict[str, str],
                              key_col: str = "vid") -> DataFrame:
    """One idempotent vertex upsert per row: coalesce(unfold(), addV)
    keyed on ``key_prop``, then payload properties overwritten — J8
    same-key-overwrite semantics, Gremlin dialect. Returns a one-column
    ``stmt`` DataFrame produced executor-side."""
    key = _gq(F.col(key_col))
    setters = [
        _prop(name, F.col(name), dtype) for name, dtype in props.items()
    ]
    stmt = F.concat(
        F.lit(f"g.V().has('{label}','{key_prop}',"), key,
        F.lit(").fold().coalesce(unfold(),"),
        F.lit(f"addV('{label}').property('{key_prop}',"), key,
        F.lit("))"), *setters, F.lit(".iterate()"),
    )
    return df.select(stmt.alias("stmt"))


def gremlin_edge_statements(df: DataFrame, edge_label: str,
                            src: tuple[str, str, str],
                            dst: tuple[str, str, str],
                            props: dict[str, str] | None = None) -> DataFrame:
    """One idempotent edge upsert per row. ``src``/``dst`` are
    ``(vertex_label, key_prop, df_column)`` endpoint lookups; the edge is
    created only if absent (coalesce over the existing-edge traversal),
    then payload properties overwritten — the reference's strict
    lock_to/spent_by shape without the existence-throw (sinks decide
    missing-endpoint policy; here absent endpoints yield a no-op
    traversal, surfaced by the submitter's result count)."""
    s_label, s_key, s_col = src
    d_label, d_key, d_col = dst
    sk, dk = _gq(F.col(s_col)), _gq(F.col(d_col))
    setters = [
        _prop(name, F.col(name), dtype)
        for name, dtype in (props or {}).items()
    ]
    stmt = F.concat(
        F.lit(f"g.V().has('{s_label}','{s_key}',"), sk,
        F.lit(").as('s').V().has('"), F.lit(d_label), F.lit("','"),
        F.lit(d_key), F.lit("',"), dk,
        F.lit(f").coalesce(__.inE('{edge_label}').where(__.outV().as('s')),"
              f"__.addE('{edge_label}').from('s'))"),
        *setters, F.lit(".iterate()"),
    )
    return df.select(stmt.alias("stmt"))
