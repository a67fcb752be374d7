"""GraphSON v3 graph projection export (S16).

The reference exports block vertices as line-delimited GraphSON v3
(``janusGraph/graphson.py:70-134``: one typed ``g:Vertex`` JSON object
per line, vertex id/bulk_id = ``"block:<hash>"``, properties wrapped as
``g:VertexProperty`` with typed values ``g:String``/``g:Int64``/``g:Date``
— the format TinkerPop readers and JanusGraph BLVP consume).

Spark-first: the whole vertex document is ONE nested Column expression
rendered by ``to_json`` — typed wrappers are structs with ``@type``/
``@value`` fields, optional properties become null structs that
``to_json`` omits (matching the reference's conditional key). The export
is a narrow map + ``write.text``: no driver loop, one line per vertex,
scales with the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _typed(tname: str, value: Column) -> Column:
    return F.struct(F.lit(tname).alias("@type"), value.alias("@value"))


def _g_string(v: Column) -> Column:
    return _typed("g:String", v.cast("string"))


def _g_int64(v: Column) -> Column:
    return _typed("g:Int64", v.cast("long"))


def _g_date_ms(ts_seconds: Column) -> Column:
    # Java Date in GraphSON is epoch millis (reference graphson.py:75-77)
    return _typed("g:Date", (ts_seconds.cast("long") * 1000))


def _vertex_property(vid: Column, label: str, typed_value: Column) -> Column:
    """g:VertexProperty with the deterministic '<vid>|<label>' prop id
    (reference graphson.py:79-101)."""
    return F.array(
        F.struct(
            F.lit("g:VertexProperty").alias("@type"),
            F.struct(
                _g_string(F.concat(vid, F.lit(f"|{label}"))).alias("id"),
                F.lit(label).alias("label"),
                typed_value.alias("value"),
            ).alias("@value"),
        )
    )


def block_vertices(blocks: DataFrame) -> DataFrame:
    """Canonical block rows → one GraphSON v3 vertex JSON line per block
    (reference ``make_block_vertex``, graphson.py:103-134): label
    'block', id/bulk_id = 'block:<hash>', typed properties, optional
    previous_block_hash omitted when null."""
    vid = F.concat(F.lit("block:"), F.col("hash"))
    prev = F.col("previous_block_hash")
    props = F.struct(
        _vertex_property(vid, "bulk_id", _g_string(vid)).alias("bulk_id"),
        _vertex_property(vid, "block_hash", _g_string(F.col("hash")))
        .alias("block_hash"),
        _vertex_property(vid, "block_number", _g_int64(F.col("number")))
        .alias("block_number"),
        _vertex_property(
            vid, "block_timestamp", _g_date_ms(F.col("timestamp"))
        ).alias("block_timestamp"),
        F.when(
            prev.isNotNull(),
            _vertex_property(vid, "previous_block_hash", _g_string(prev)),
        ).alias("previous_block_hash"),
    )
    vertex = F.struct(
        F.lit("g:Vertex").alias("@type"),
        F.struct(
            _g_string(vid).alias("id"),
            F.lit("block").alias("label"),
            props.alias("properties"),
        ).alias("@value"),
    )
    return blocks.select(F.to_json(vertex).alias("value"))


def export_block_vertices(blocks: DataFrame, out_dir: str) -> None:
    """Distributed line-delimited GraphSON export (the BLVP input file)."""
    block_vertices(blocks).write.mode("overwrite").text(out_dir)
