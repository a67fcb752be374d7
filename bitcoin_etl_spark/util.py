"""Small engine-internal utilities shared across modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Release the executor-storage blocks behind a localCheckpointed
    DataFrame.

    ``Dataset.unpersist()`` does NOT free them: checkpoint blocks belong
    to the underlying RDD, not the SQL cache manager, so they linger in
    executor storage until the JVM garbage-collects the RDD — an
    unbounded wait under py4j's batched finalizers. This walks the
    analyzed plan to the ``LogicalRDD`` node and unpersists its RDD
    directly (verified: storage info drops to zero immediately).

    Call it only on checkpoints whose data is no longer referenced by
    any live plan — a consumer still holding the plan would recompute
    from an EMPTY lineage and lose rows silently. Frees every
    ``LogicalRDD`` in the plan (a composed frame may hold several);
    returns how many were released.
    """
    freed = 0
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() == "LogicalRDD":
                node.rdd().unpersist(blocking)
                freed += 1
                continue
            kids = node.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))
    except Exception:
        pass
    return freed
