"""Batch export jobs — the ``export_all`` / exporter-sink analogs.

* ``export_partitioned`` — Hive-style range-partitioned export
  (reference ``bitcoinetl/jobs/export_all.py:43-150`` writes
  ``output/blocks/start_block=X/end_block=Y/blocks_X_Y.json``; here the
  range key becomes a real partition column so one distributed write
  replaces the per-range Python loop).
* ``export_items`` — per-type routed sink with JSONL/CSV formats
  (reference ``composite_item_exporter.py:43-79`` routing +
  ``exporters.py:99-178`` CSV/JSON encoders; arrays are joined with ','
  for CSV exactly like ``exporters.py:155-157``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def export_partitioned(
    df: DataFrame,
    out_dir: str,
    range_col: str = "block_number",
    batch_size: int = 100,
    fmt: str = "json",
) -> None:
    """Partition rows into [start,end] ranges of ``batch_size`` and write
    one directory per range: ``start_block=X/end_block=Y/``. A single
    distributed write; partition pruning works on read."""
    start = (F.floor(F.col(range_col) / batch_size) * batch_size).cast("long")
    out = (
        df.withColumn("start_block", start)
        .withColumn("end_block", start + batch_size - 1)
    )
    writer = out.write.partitionBy("start_block", "end_block").mode("overwrite")
    if fmt == "json":
        writer.json(out_dir)
    elif fmt == "csv":
        writer.csv(out_dir, header=True)
    else:
        writer.parquet(out_dir)


def _csv_safe(df: DataFrame) -> DataFrame:
    """CSV can't carry arrays/structs: join arrays with ',' (reference
    ``exporters.py:155-157``), JSON-encode structs."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            cols.append(
                F.concat_ws(",", F.col(f.name).cast("array<string>")).alias(f.name)
            )
        elif isinstance(f.dataType, (T.StructType, T.MapType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def export_items(items: dict[str, DataFrame], out_dir: str,
                 fmt: str = "json") -> dict[str, int]:
    """Route item DataFrames by type to per-type sinks; returns per-type
    counts (the AtomicCounter analog, A7). Counts ride the write job as
    an Observation — one job per sink, never a recompute."""
    import uuid

    from pyspark.sql import Observation

    counts = {}
    for item_type, df in items.items():
        path = f"{out_dir}/{item_type}"
        obs = Observation(f"export-{item_type}-{uuid.uuid4().hex[:6]}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
        if fmt == "json":
            observed.write.mode("overwrite").json(path)
        elif fmt == "csv":
            _csv_safe(observed).write.mode("overwrite").csv(path, header=True)
        else:
            observed.write.mode("overwrite").parquet(path)
        counts[item_type] = int(obs.get.get("n") or 0)
    return counts
