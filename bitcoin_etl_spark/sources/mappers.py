"""Block/transaction mappers — the reference's row-loop mappers
(``bitcoinetl/mappers/*.py``) re-expressed as pure Column expressions
over the nested raw-block DataFrame. Everything is Catalyst-planned:
``posexplode`` for positional indexes, ``transform`` over nested arrays,
higher-order ``aggregate`` for per-row sums — no Python in the data path.

Operator parity (SURVEY.md §2):
* P1  map_blocks        — rename/project (``mappers/block_mapper.py:37-97``)
* P2  map_transactions  — inherit parent block fields, positional index
                          (``mappers/transaction_mapper.py:39-93``)
* P3  vin/vout structs  — (``transaction_input_mapper.py:28-50``,
                          ``transaction_output_mapper.py:29-56``)
* P4  derived aggregates— counts/values/fee (``domain/transaction.py:62-72``)
* P5  coinbase rewrite  — detach coinbase input, hoist coinbase_param
                          (``service/btc_service.py:143-154``)
* P6  nonstandard addr  — sha256-script synthetic address
                          (``service/btc_service.py:156-160``)
* P8  satoshi conversion— Decimal ×10^8 (``btc_utils.py:5-12``)
* P13 item_id           — PK stamping (``btc_item_id_calculator.py:29-47``)
* E1/E2 explode_inputs/outputs — ARRAY JOIN analogs
                          (``clickhouse/clickhouse_sync_data.py:150-220``)
* J1/J3 enrich_inputs   — spend join with revision flag
                          (``jobs/enrich_transactions.py:56-100``,
                          ``…_202309.py:223-271``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.core import bitcoin_to_satoshi, item_id, nonstandard_address


def map_blocks(raw: DataFrame) -> DataFrame:
    """Canonical block rows (P1 + P5 coinbase_param hoist + P13)."""
    coinbase_param = F.element_at(F.col("tx"), 1)["vin"][0]["coinbase"]
    return raw.select(
        F.col("hash"),
        F.col("size"),
        F.col("strippedsize").alias("stripped_size"),
        F.col("weight"),
        F.col("height").alias("number"),
        F.col("version"),
        F.col("merkleroot").alias("merkle_root"),
        F.col("time").alias("timestamp"),
        F.col("nonce"),
        F.col("bits"),
        F.col("difficulty"),
        F.col("previousblockhash").alias("previous_block_hash"),
        coinbase_param.alias("coinbase_param"),
        F.col("nTx").cast("long").alias("transaction_count"),
        F.transform(F.col("tx"), lambda t: t["txid"]).alias("transactions"),
    ).withColumn("item_id", item_id("block", F.col("hash")))


def _input_struct(v, i):
    # value/type are NULL until spend-enrichment (J1) resolves them —
    # except synthetic shielded inputs, which carry their own value
    # (reference btc_service.py:162-187 sets input.value/input.type
    # directly; domain/transaction.py:62-64 sums input values whether
    # enriched or shielded).
    return F.struct(
        i.alias("index"),
        v["txid"].alias("spent_transaction_hash"),
        v["vout"].alias("spent_output_index"),
        v["scriptSig"]["asm"].alias("script_asm"),
        v["scriptSig"]["hex"].alias("script_hex"),
        v["sequence"].alias("sequence"),
        v["coinbase"].isNotNull().alias("is_coinbase"),
        F.lit(None).cast("long").alias("value"),
        F.lit(None).cast("string").alias("type"),
    )


def _output_struct(v, i):
    spk = v["scriptPubKey"]
    no_addr = spk["addresses"].isNull() | (F.size(spk["addresses"]) == 0)
    return F.struct(
        i.alias("index"),
        spk["asm"].alias("script_asm"),
        spk["hex"].alias("script_hex"),
        F.when(no_addr, F.lit(None).cast("int"))
        .otherwise(spk["reqSigs"]).alias("required_signatures"),
        F.when(no_addr, F.lit("nonstandard")).otherwise(spk["type"]).alias("type"),
        F.when(no_addr, F.array(nonstandard_address(spk["hex"])))
        .otherwise(spk["addresses"]).alias("addresses"),
        bitcoin_to_satoshi(v["value"]).alias("value"),
    )


def map_transactions(raw: DataFrame) -> DataFrame:
    """Canonical transaction rows with nested input/output structs and
    derived aggregates (P2-P6, P8, P13). One narrow pass: posexplode +
    transform + aggregate — no shuffle."""
    t = raw.select(
        F.col("hash").alias("block_hash"),
        F.col("height").alias("block_number"),
        F.col("time").alias("block_timestamp"),
        F.posexplode("tx").alias("index", "t"),
    )
    vin = F.col("t.vin")
    vout = F.col("t.vout")
    is_cb = F.exists(vin, lambda v: v["coinbase"].isNotNull())
    # P5: coinbase input is detached from the inputs list
    real_vin = F.filter(vin, lambda v: v["coinbase"].isNull())
    inputs = F.transform(
        real_vin, lambda v, i: _input_struct(v, i)
    )
    outputs = F.transform(vout, lambda v: _output_struct(v, v["n"]))
    df = t.select(
        F.col("t.txid").alias("hash"),
        F.col("t.size").alias("size"),
        F.col("t.vsize").alias("virtual_size"),
        F.col("t.version").alias("version"),
        F.col("t.locktime").alias("lock_time"),
        "block_hash",
        "block_number",
        "block_timestamp",
        F.col("index"),
        is_cb.alias("is_coinbase"),
        inputs.alias("inputs"),
        outputs.alias("outputs"),
    )
    # P4: derived aggregates over the nested arrays (per-row, no shuffle).
    # Input values are unknown until enrichment (J1); fee is 0 for
    # coinbase per domain/transaction.py:66-72.
    out_val = F.aggregate(
        F.col("outputs"), F.lit(0).cast("long"), lambda acc, o: acc + o["value"]
    )
    return (
        df.withColumn("input_count", F.size("inputs"))
        .withColumn("output_count", F.size("outputs"))
        .withColumn("output_value", out_val)
        .withColumn("item_id", item_id("transaction", F.col("hash")))
    )


def explode_inputs(tx: DataFrame) -> DataFrame:
    """E1: ARRAY JOIN inputs → one row per spend edge."""
    return tx.select(
        F.col("hash").alias("transaction_hash"),
        "block_hash",
        "block_number",
        "block_timestamp",
        F.explode("inputs").alias("i"),
    ).select(
        "transaction_hash", "block_hash", "block_number", "block_timestamp",
        "i.*",
    ).withColumn(
        "item_id",
        item_id("input", F.col("transaction_hash"), F.col("index")),
    )


def explode_outputs(tx: DataFrame) -> DataFrame:
    """E2: ARRAY JOIN outputs, with empty spent-placeholders and
    ``revision 0`` exactly like the reference
    (``clickhouse_sync_data.py:185-220``)."""
    return tx.select(
        F.col("hash").alias("transaction_hash"),
        "block_hash",
        "block_number",
        "block_timestamp",
        F.explode("outputs").alias("o"),
    ).select(
        "transaction_hash", "block_hash", "block_number", "block_timestamp",
        "o.*",
    ).withColumn(
        "spent_transaction_hash", F.lit(None).cast("string")
    ).withColumn(
        "spent_input_index", F.lit(None).cast("int")
    ).withColumn(
        "revision", F.lit(0)
    ).withColumn(
        "item_id",
        item_id("output", F.col("transaction_hash"), F.col("index")),
    )


def enrich_inputs(inputs: DataFrame, outputs: DataFrame) -> DataFrame:
    """J1+J3: composite-key equi-join inputs ⋈ outputs on
    (spent_transaction_hash, spent_output_index); copy
    value/addresses/type/required_signatures from the spent output;
    LEFT join so unresolved spends survive with ``revision 0``
    (the one-pass found/missing split, ``…_202309.py:223-271``).
    Catalyst picks broadcast vs sort-merge; AQE splits skewed keys."""
    o = outputs.select(
        F.col("transaction_hash").alias("_o_tx"),
        F.col("index").alias("_o_idx"),
        F.col("value").alias("_o_value"),
        F.col("addresses").alias("_o_addresses"),
        F.col("type").alias("_o_type"),
        F.col("required_signatures").alias("_o_reqsigs"),
    )
    j = inputs.join(
        o,
        (inputs.spent_transaction_hash == o._o_tx)
        & (inputs.spent_output_index == o._o_idx),
        "left",
    )
    # coalesce keeps values the input already carries (shielded inputs
    # have value/type with no spend to resolve — reference
    # btc_service.py:178-182)
    return (
        j.withColumn("value", F.coalesce(F.col("_o_value"), F.col("value")))
        .withColumn("addresses", F.col("_o_addresses"))
        .withColumn("type", F.coalesce(F.col("_o_type"), F.col("type")))
        .withColumn("required_signatures", F.col("_o_reqsigs"))
        .withColumn(
            "revision", F.when(F.col("_o_tx").isNull(), 0).otherwise(1)
        )
        .drop("_o_tx", "_o_idx", "_o_value", "_o_addresses", "_o_type",
              "_o_reqsigs")
    )


def append_shielded_entries(
    tx: DataFrame,
    value_balance_col: str = "value_balance",
) -> DataFrame:
    """P7: Zcash shielded value synthesis (reference
    ``service/btc_service.py:162-187``, index append
    ``domain/transaction.py:46-60``): a positive value balance appends a
    synthetic 'shielded' INPUT at the next input index; a negative one
    appends a synthetic shielded OUTPUT. Pure array_union + computed
    struct — the additive-variance pattern for chain-specific fields."""
    vb = F.col(value_balance_col)
    next_in_idx = F.size("inputs")
    next_out_idx = F.size("outputs")
    # reference parity (btc_service.py:178-187): shielded input carries
    # value=value_balance and type='shielded'; shielded output carries
    # value=-value_balance and type='shielded' with NO addresses (the
    # reference leaves output.addresses unset — nothing is invented)
    shielded_in = F.struct(
        next_in_idx.alias("index"),
        F.lit(None).cast("string").alias("spent_transaction_hash"),
        F.lit(None).cast("int").alias("spent_output_index"),
        F.lit(None).cast("string").alias("script_asm"),
        F.lit(None).cast("string").alias("script_hex"),
        F.lit(None).cast("long").alias("sequence"),
        F.lit(False).alias("is_coinbase"),
        bitcoin_to_satoshi(vb).alias("value"),
        F.lit("shielded").alias("type"),
    )
    shielded_out = F.struct(
        next_out_idx.alias("index"),
        F.lit(None).cast("string").alias("script_asm"),
        F.lit(None).cast("string").alias("script_hex"),
        F.lit(None).cast("int").alias("required_signatures"),
        F.lit("shielded").alias("type"),
        F.lit(None).cast("array<string>").alias("addresses"),
        bitcoin_to_satoshi(-vb).alias("value"),
    )
    out = tx.withColumn(
        "inputs",
        F.when(vb > 0, F.concat("inputs", F.array(shielded_in)))
        .otherwise(F.col("inputs")),
    ).withColumn(
        "outputs",
        F.when(vb < 0, F.concat("outputs", F.array(shielded_out)))
        .otherwise(F.col("outputs")),
    )
    return (
        out.withColumn("input_count", F.size("inputs"))
        .withColumn("output_count", F.size("outputs"))
    )


def regroup_transactions_by_block(
    block_tx_hashes: DataFrame, tx_details: DataFrame
) -> DataFrame:
    """S3: old-API two-phase fetch regroup (reference
    ``service/btc_service.py:104-112``: BCH/DOGE/DASH return only tx
    hashes, details fetched separately, then re-nested under the block).
    Spark shape: explode → join → sort_array(collect_list(struct))."""
    pairs = block_tx_hashes.select(
        "block_hash", F.posexplode("transactions").alias("tx_index", "tx_hash")
    )
    j = pairs.join(
        tx_details.withColumnRenamed("hash", "tx_hash"), "tx_hash", "inner"
    )
    regrouped = j.groupBy("block_hash").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("tx_index"), F.col("tx_hash")))
        ).alias("_sorted"),
        F.count("*").alias("tx_count"),
    )
    return regrouped.select(
        "block_hash",
        F.transform(F.col("_sorted"), lambda s: s["tx_hash"]).alias("transactions"),
        "tx_count",
    )


def transaction_fees(tx: DataFrame, enriched_inputs: DataFrame) -> DataFrame:
    """P4 completion after J1: input_value = sum of enriched input values,
    fee = input_value − output_value (0 for coinbase,
    ``domain/transaction.py:66-72``)."""
    iv = enriched_inputs.groupBy(
        F.col("transaction_hash").alias("hash")
    ).agg(F.sum("value").alias("input_value"))
    j = tx.join(iv, "hash", "left")
    input_value = F.coalesce(F.col("input_value"), F.lit(0).cast("long"))
    fee = F.when(F.col("is_coinbase"), F.lit(0).cast("long")).otherwise(
        input_value - F.col("output_value")
    )
    return j.withColumn("input_value", input_value).withColumn("fee", fee)
