"""Raw-block source: the bitcoind ``getblock verbosity=2`` JSON shape as
an explicit StructType, plus a deterministic synthetic chain generator
(the MockBitcoinRpc analog — reference
``tests/bitcoinetl/job/mock_bitcoin_rpc.py:26-62`` serves canned JSON;
we synthesize the same shape seed-fixed instead of shipping fixtures).

The schema mirrors the public Bitcoin Core RPC result the reference
consumes (``bitcoinetl/service/btc_service.py:54-84``,
``bitcoinetl/mappers/*``): nested ``tx[].vin[]``/``tx[].vout[]`` with
scriptSig/scriptPubKey structs. Values are BTC decimals (converted to
satoshis downstream, never floats — SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib
import json
from decimal import Decimal

from pyspark.sql import SparkSession, types as T

_SCRIPT_SIG = T.StructType(
    [T.StructField("asm", T.StringType()), T.StructField("hex", T.StringType())]
)
_SCRIPT_PUBKEY = T.StructType(
    [
        T.StructField("asm", T.StringType()),
        T.StructField("hex", T.StringType()),
        T.StructField("reqSigs", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("addresses", T.ArrayType(T.StringType())),
    ]
)
_VIN = T.StructType(
    [
        T.StructField("coinbase", T.StringType()),
        T.StructField("txid", T.StringType()),
        T.StructField("vout", T.IntegerType()),
        T.StructField("scriptSig", _SCRIPT_SIG),
        T.StructField("sequence", T.LongType()),
    ]
)
_VOUT = T.StructType(
    [
        T.StructField("value", T.DecimalType(16, 8)),
        T.StructField("n", T.IntegerType()),
        T.StructField("scriptPubKey", _SCRIPT_PUBKEY),
    ]
)
_TX = T.StructType(
    [
        T.StructField("txid", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("vsize", T.IntegerType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("locktime", T.LongType()),
        T.StructField("vin", T.ArrayType(_VIN)),
        T.StructField("vout", T.ArrayType(_VOUT)),
    ]
)
RAW_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("height", T.LongType()),
        T.StructField("version", T.LongType()),
        T.StructField("merkleroot", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("nonce", T.StringType()),
        T.StructField("bits", T.StringType()),
        T.StructField("difficulty", T.DoubleType()),
        T.StructField("previousblockhash", T.StringType()),
        T.StructField("strippedsize", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("weight", T.LongType()),
        T.StructField("nTx", T.IntegerType()),
        T.StructField("tx", T.ArrayType(_TX)),
    ]
)


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def generate_raw_chain(
    spark: SparkSession,
    n_blocks: int = 20,
    txs_per_block: int = 5,
    seed: int = 42,
    start_height: int = 0,
):
    """Deterministic synthetic chain: every non-coinbase input spends a
    real earlier output, so the enrichment join (J1) is fully resolvable.
    Returns a DataFrame with RAW_BLOCK_SCHEMA."""
    utxo: list[tuple[str, int, Decimal]] = []  # (txid, n, value)
    blocks = []
    prev_hash = "0" * 64
    for b in range(start_height, start_height + n_blocks):
        txs = []
        # coinbase
        cb_txid = _h(f"{seed}:cb:{b}")
        cb_out_val = Decimal("50.00000000")
        txs.append(
            {
                "txid": cb_txid,
                "hash": cb_txid,
                "size": 200,
                "vsize": 200,
                "version": 1,
                "locktime": 0,
                "vin": [
                    {
                        "coinbase": _h(f"{seed}:cbparam:{b}")[:16],
                        "txid": None,
                        "vout": None,
                        "scriptSig": None,
                        "sequence": 4294967295,
                    }
                ],
                "vout": [
                    {
                        "value": cb_out_val,
                        "n": 0,
                        "scriptPubKey": {
                            "asm": "OP_DUP OP_HASH160",
                            "hex": _h(f"{seed}:spk:{b}:cb")[:40],
                            "reqSigs": 1,
                            "type": "pubkeyhash",
                            "addresses": [f"addr_{_h(f'{seed}:a:{b}:cb')[:20]}"],
                        },
                    }
                ],
            }
        )
        new_utxo = [(cb_txid, 0, cb_out_val)]
        for t in range(txs_per_block - 1):
            if not utxo:
                break
            spend = utxo.pop(hash((seed, b, t)) % len(utxo))
            txid = _h(f"{seed}:tx:{b}:{t}")
            fee = Decimal("0.00010000")
            n_out = 2
            # satoshi-exact split: quantize the first share, remainder to
            # the second output so input = outputs + fee exactly
            share0 = ((spend[2] - fee) / n_out).quantize(Decimal("0.00000001"))
            shares = [share0, spend[2] - fee - share0]
            vouts = []
            for n in range(n_out):
                share = shares[n]
                # every 7th output is script-only → nonstandard address path
                nonstd = (b + t + n) % 7 == 0
                vouts.append(
                    {
                        "value": share,
                        "n": n,
                        "scriptPubKey": {
                            "asm": "OP_RETURN" if nonstd else "OP_DUP OP_HASH160",
                            "hex": _h(f"{seed}:spk:{b}:{t}:{n}")[:40],
                            "reqSigs": None if nonstd else 1,
                            "type": "nulldata" if nonstd else "pubkeyhash",
                            "addresses": None
                            if nonstd
                            else [f"addr_{_h(f'{seed}:a:{b}:{t}:{n}')[:20]}"],
                        },
                    }
                )
                new_utxo.append((txid, n, share))
            txs.append(
                {
                    "txid": txid,
                    "hash": txid,
                    "size": 300,
                    "vsize": 280,
                    "version": 2,
                    "locktime": 0,
                    "vin": [
                        {
                            "coinbase": None,
                            "txid": spend[0],
                            "vout": spend[1],
                            "scriptSig": {"asm": "sig", "hex": "aa"},
                            "sequence": 4294967294,
                        }
                    ],
                    "vout": vouts,
                }
            )
        utxo.extend(new_utxo)
        bh = _h(f"{seed}:block:{b}")
        blocks.append(
            {
                "hash": bh,
                "height": b,
                "version": 0x20000000,
                "merkleroot": _h(f"{seed}:mr:{b}"),
                "time": 1_600_000_000 + b * 600,
                "nonce": format(b * 2654435761 % 2**32, "08x"),
                "bits": "1d00ffff",
                "difficulty": 1.0 + b,
                "previousblockhash": prev_hash,
                "strippedsize": 285 * len(txs),
                "size": 300 * len(txs),
                "weight": 1140 * len(txs),
                "nTx": len(txs),
                "tx": txs,
            }
        )
        prev_hash = bh
    # Through JSON so Decimal→str survives; read with explicit schema.
    rows = [json.dumps(blk, default=str) for blk in blocks]
    return spark.read.schema(RAW_BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(rows, max(1, n_blocks // 10))
    )
