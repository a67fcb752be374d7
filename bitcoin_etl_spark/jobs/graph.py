"""Graph projection (S15/J8): the reference's NebulaGraph model as
DataFrame projections + a distributed nGQL statement generator.

Reference model (``nebula/schema:1-49``): vertex tags block /
transaction / output / address and edges belongs_to (tx→block),
chain_to (block→parent), lock_to (tx→output), pay_to (output→address),
spent_by (output→spending tx, prop spent_input_index), coinbase
(block→coinbase tx); output VID = ``"<tx_hash>:<vout>"``. The reference
loads these through NebulaGraph Spark Exchange configs
(``nebula/01_tag_block.sh`` etc.) reading ClickHouse; here the
projections are pure Column expressions over the canonical mapped
tables, and the sink statements are generated AS A DATAFRAME COLUMN
(one idempotent ``INSERT VERTEX/EDGE`` upsert per row — Nebula
overwrites on same VID, the J8 key-lookup-upsert semantics), so the
statement stream is produced executor-side and can be written/fed to a
graph client without any driver loop. No graph server exists in this
sandbox; statement text is golden-tested offline (the Iceberg/Kafka
treatment)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _q(col) -> Column:
    """Escape + quote a string value for nGQL. The statement stream is
    one-statement-per-line, so embedded newlines/CRs/tabs are escaped to
    their ``\\n``/``\\r``/``\\t`` forms and any remaining C0 control
    character is dropped — a raw control byte would either split the
    line or corrupt the console protocol."""
    s = F.regexp_replace(col.cast("string"), r'(["\\])', r"\\$1")
    s = F.regexp_replace(s, r"\n", r"\\n")
    s = F.regexp_replace(s, r"\r", r"\\r")
    s = F.regexp_replace(s, r"\t", r"\\t")
    s = F.regexp_replace(s, r"[\x00-\x1F]", "")
    return F.concat(F.lit('"'), s, F.lit('"'))


# ------------------------------------------------------------- vertices
def block_vertices_df(blocks: DataFrame) -> DataFrame:
    return blocks.select(
        F.col("hash").alias("vid"),
        F.col("number").alias("block_number"),
        F.col("timestamp").alias("block_timestamp"),
        F.col("previous_block_hash"),
    )


def transaction_vertices_df(tx: DataFrame) -> DataFrame:
    return tx.select(F.col("hash").alias("vid"), "is_coinbase")


def output_vertices_df(outputs: DataFrame) -> DataFrame:
    """Output VID = '<tx_hash>:<vout>' (reference nebula/schema:22)."""
    return outputs.select(
        F.concat_ws(":", "transaction_hash", "index").alias("vid"),
        "transaction_hash",
        F.col("index").alias("output_index"),
        F.col("type").alias("output_type"),
        F.col("value").alias("output_value"),
    )


def address_vertices_df(outputs: DataFrame) -> DataFrame:
    return (
        outputs.select(F.explode("addresses").alias("address"))
        .distinct()
        .select(F.col("address").alias("vid"), "address")
    )


# ---------------------------------------------------------------- edges
def belongs_to_edges(tx: DataFrame) -> DataFrame:
    return tx.select(
        F.col("hash").alias("src"), F.col("block_hash").alias("dst")
    )


def chain_to_edges(blocks: DataFrame) -> DataFrame:
    # genesis carries no parent: bitcoind omits previousblockhash (NULL
    # here) or serializes the all-zero sentinel — neither is an edge
    prev = F.col("previous_block_hash")
    return blocks.filter(
        prev.isNotNull() & (prev != F.lit("0" * 64))
    ).select(F.col("hash").alias("src"), prev.alias("dst"))


def lock_to_edges(outputs: DataFrame) -> DataFrame:
    return outputs.select(
        F.col("transaction_hash").alias("src"),
        F.concat_ws(":", "transaction_hash", "index").alias("dst"),
        F.col("index").alias("output_index"),
    )


def pay_to_edges(outputs: DataFrame) -> DataFrame:
    return outputs.select(
        F.concat_ws(":", "transaction_hash", "index").alias("src"),
        F.explode("addresses").alias("dst"),
    )


def spent_by_edges(inputs: DataFrame) -> DataFrame:
    """(spent output) → (spending tx); only resolved spends qualify."""
    return inputs.filter(F.col("spent_transaction_hash").isNotNull()).select(
        F.concat_ws(
            ":", "spent_transaction_hash", "spent_output_index"
        ).alias("src"),
        F.col("transaction_hash").alias("dst"),
        F.col("index").alias("spent_input_index"),
    )


def coinbase_edges(tx: DataFrame) -> DataFrame:
    return tx.filter(F.col("is_coinbase")).select(
        F.col("block_hash").alias("src"), F.col("hash").alias("dst")
    )


# ------------------------------------------------- nGQL statement stream
def _val(col, dtype) -> Column:
    # Every branch must render SQL NULL as the literal ``NULL`` — a bare
    # NULL column would be silently DROPPED by the enclosing
    # concat_ws(", ", ...), misaligning the value list against the
    # declared prop names.
    if dtype in ("string",):
        return F.coalesce(_q(col), F.lit("NULL"))
    if dtype == "boolean":
        return F.coalesce(
            F.when(col, "true").when(~col, "false"), F.lit("NULL")
        )
    if dtype == "datetime":
        return F.coalesce(
            F.concat(
                F.lit('datetime("'),
                F.date_format(
                    F.timestamp_seconds(col), "yyyy-MM-dd'T'HH:mm:ss"
                ),
                F.lit('")'),
            ),
            F.lit("NULL"),
        )
    return F.coalesce(col.cast("string"), F.lit("NULL"))


def ngql_vertex_statements(df: DataFrame, tag: str,
                           props: dict[str, str]) -> DataFrame:
    """One idempotent INSERT VERTEX upsert per row (same-VID overwrite =
    J8 key-lookup upsert). Output: a one-column ``stmt`` DataFrame
    produced executor-side."""
    names = ", ".join(props)
    vals = F.concat_ws(
        ", ", *[_val(F.col(c), t) for c, t in props.items()]
    )
    stmt = F.concat(
        F.lit(f"INSERT VERTEX {tag}({names}) VALUES "),
        _q(F.col("vid")), F.lit(":("), vals, F.lit(");"),
    )
    return df.select(stmt.alias("stmt"))


def ngql_edge_statements(df: DataFrame, edge: str,
                         props: dict[str, str] | None = None) -> DataFrame:
    props = props or {}
    names = f"({', '.join(props)})" if props else "()"
    vals = (
        F.concat_ws(", ", *[_val(F.col(c), t) for c, t in props.items()])
        if props else F.lit("")
    )
    stmt = F.concat(
        F.lit(f"INSERT EDGE {edge}{names} VALUES "),
        _q(F.col("src")), F.lit("->"), _q(F.col("dst")),
        F.lit(":("), vals, F.lit(");"),
    )
    return df.select(stmt.alias("stmt"))
