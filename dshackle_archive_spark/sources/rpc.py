"""Real-chain HTTP JSON-RPC providers (S6/S7 in SURVEY §2.1).

The reference speaks JSON-RPC to a node (directly or via a dshackle gRPC
proxy) with per-method calls — ``eth_getBlockByNumber``/``eth_getTransaction
ByHash``/``debug_traceTransaction`` for Ethereum
(``/root/reference/src/blockchain/ethereum.rs:41-202``) and ``getblockhash``/
``getblock``/``getrawtransaction`` for Bitcoin (``bitcoin.rs:55-201``).

These providers implement the engine's per-chain plugin surface (the same
interface as ``MockChain``) over plain HTTP JSON-RPC via the standard
library — no extra dependencies, picklable into Spark workers, retried and
rate-capped by ``FetchPolicy`` inside the fetch stage. The gRPC/dshackle
transport (S8) remains a declared plug point: swap ``JsonRpcClient`` for a
gRPC-backed callable with the same ``call``/``call_raw`` signature.

Byte fidelity note: the ``json`` payload columns store the RPC ``result``
re-serialized compactly (``separators=(',', ':')``, document key order
preserved) — semantically identical JSON; byte-identical for nodes that emit
compact JSON (normal for geth/bitcoind).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any

from ..schemas import BTC_BLOCK_JSON_SCHEMA, ETH_BLOCK_JSON_SCHEMA


class JsonRpcError(RuntimeError):
    pass


class JsonRpcClient:
    """Minimal JSON-RPC 2.0 over HTTP POST (stdlib urllib; picklable)."""

    def __init__(self, url: str, timeout_s: float = 10.0):
        self.url = url
        self.timeout_s = timeout_s
        self._id = 0

    def call(self, method: str, params: list) -> Any:
        self._id += 1
        body = json.dumps(
            {"jsonrpc": "2.0", "id": self._id, "method": method, "params": params}
        ).encode()
        req = urllib.request.Request(
            self.url, data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read())
        if payload.get("error"):
            raise JsonRpcError(f"{method}: {payload['error']}")
        return payload.get("result")

    def call_raw(self, method: str, params: list) -> bytes:
        """The result re-serialized compactly (document key order kept)."""
        return _compact(self.call(method, params))


def _compact(obj: Any) -> bytes:
    return json.dumps(obj, separators=(",", ":")).encode()


def _require(value: Any, what: str) -> Any:
    """null results are transient on lagging nodes — raise so FetchPolicy
    retries (the reference's ``get_tx_expected`` retry-on-null,
    ``ethereum.rs:108-131``)."""
    if value is None:
        raise JsonRpcError(f"{what} not found")
    return value


class EthereumRpcProvider:
    """Ethereum JSON-RPC provider (``ethereum.rs:41-202``).

    Populates the full TX_SCHEMA surface: ``from``/``to`` parsed out of the
    tx JSON (``ethereum.rs:274-280``), receipts, raw wire bytes, and up to
    two uncle payloads per block (``avros.rs:58-75``; ETH consensus caps
    uncles at 2)."""

    blockchain_type = "ETHEREUM"
    block_json_schema = ETH_BLOCK_JSON_SCHEMA
    tx_list_field = "transactions"
    fork_at: frozenset = frozenset()

    def __init__(self, url: str, blockchain_id: str = "ETH", timeout_s: float = 10.0):
        self.blockchain_id = blockchain_id
        self.client = JsonRpcClient(url, timeout_s)
        self._blocks: dict[int, dict] = {}  # per-worker block cache

    # -- blocks -------------------------------------------------------------
    def _block(self, height: int) -> dict:
        blk = self._blocks.get(height)
        if blk is None:
            blk = _require(
                self.client.call("eth_getBlockByNumber", [hex(height), False]),
                f"block {height}",
            )
            if len(self._blocks) > 64:  # bound worker memory
                self._blocks.clear()
            self._blocks[height] = blk
        return blk

    def head(self) -> int:
        return int(self.client.call("eth_blockNumber", []), 16)

    def finalized(self) -> int:
        blk = _require(
            self.client.call("eth_getBlockByNumber", ["finalized", False]),
            "finalized block",
        )
        return int(blk["number"], 16)

    def block(self, height: int, fork: bool = False) -> dict:
        j = self._block(height)
        return {
            "height": height,
            "hash": j["hash"],
            "parent": j["parentHash"],
            "transactions": list(j.get("transactions") or []),
        }

    def block_json(self, height: int, fork: bool = False) -> bytes:
        return _compact(self._block(height))

    def block_timestamp_ms(self, height: int) -> int:
        return int(self._block(height)["timestamp"], 16) * 1000

    def block_hash(self, height: int, fork: bool = False) -> str:
        return self._block(height)["hash"]

    def tx_ids(self, height: int) -> list[str]:
        return list(self._block(height).get("transactions") or [])

    def uncles(self, height: int, fork: bool = False) -> list[bytes]:
        j = self._block(height)
        out = []
        for i in range(len(j.get("uncles") or [])):
            u = _require(
                self.client.call(
                    "eth_getUncleByBlockHashAndIndex", [j["hash"], hex(i)]
                ),
                f"uncle {i} of block {height}",
            )
            out.append(_compact(u))
        return out

    # -- transactions -------------------------------------------------------
    def tx_details(self, height: int, txid: str) -> dict:
        tx = _require(
            self.client.call("eth_getTransactionByHash", [txid]), f"tx {txid}"
        )
        return {
            "json": _compact(tx),
            "raw": self.tx_raw(txid),
            "from": tx.get("from"),
            "to": tx.get("to"),
            "receiptJson": self.receipt_json(txid),
        }

    def tx_json(self, height: int, txid: str) -> bytes:
        return _compact(
            _require(self.client.call("eth_getTransactionByHash", [txid]), f"tx {txid}")
        )

    def tx_raw(self, txid: str) -> bytes:
        raw_hex = _require(
            self.client.call("eth_getRawTransactionByHash", [txid]), f"raw tx {txid}"
        )
        return bytes.fromhex(raw_hex[2:] if raw_hex.startswith("0x") else raw_hex)

    def receipt_json(self, txid: str) -> bytes:
        return _compact(
            _require(
                self.client.call("eth_getTransactionReceipt", [txid]),
                f"receipt {txid}",
            )
        )

    # -- head subscription (S9) --------------------------------------------
    # The reference holds a server-streaming gRPC subscription
    # (connection.rs:53-154). Over plain JSON-RPC the push-equivalent is the
    # node's filter API: install eth_newBlockFilter once, then each
    # eth_getFilterChanges returns ONLY the hashes of blocks since the last
    # poll — incremental delivery without re-reading the head.
    _head_filter: str | None = None

    def subscribe_heads(self) -> None:
        """Install (or reinstall) the new-heads filter on the node."""
        self._head_filter = _require(
            self.client.call("eth_newBlockFilter", []), "new block filter"
        )

    def poll_new_heads(self) -> list[str]:
        """Block hashes arrived since the previous poll (empty when idle).
        Installs the filter lazily; re-installs if the node expired it."""
        if self._head_filter is None:
            self.subscribe_heads()
        try:
            return list(
                self.client.call("eth_getFilterChanges", [self._head_filter]) or []
            )
        except JsonRpcError:
            # nodes expire idle filters — reinstall and resync from head
            self.subscribe_heads()
            return list(
                self.client.call("eth_getFilterChanges", [self._head_filter]) or []
            )

    # -- traces (geth built-in tracers, ethereum.rs:149-204) ---------------
    def trace_json(self, txid: str) -> bytes:
        return _compact(
            _require(
                self.client.call(
                    "debug_traceTransaction", [txid, {"tracer": "callTracer"}]
                ),
                f"trace {txid}",
            )
        )

    def state_diff_json(self, txid: str) -> bytes:
        return _compact(
            _require(
                self.client.call(
                    "debug_traceTransaction",
                    [
                        txid,
                        {
                            "tracer": "prestateTracer",
                            "tracerConfig": {"diffMode": True},
                        },
                    ],
                ),
                f"state diff {txid}",
            )
        )


class BitcoinRpcProvider:
    """Bitcoin Core JSON-RPC provider (``bitcoin.rs:55-201``): block by
    ``getblockhash``+``getblock(hash, 1)``, tx json/raw via
    ``getrawtransaction(txid, true/false)``. No receipts, no ``from``/``to``,
    no uncles, no traces — exactly the reference's column coverage."""

    blockchain_type = "BITCOIN"
    block_json_schema = BTC_BLOCK_JSON_SCHEMA
    tx_list_field = "tx"
    fork_at: frozenset = frozenset()

    def __init__(self, url: str, blockchain_id: str = "BTC", timeout_s: float = 10.0):
        self.blockchain_id = blockchain_id
        self.client = JsonRpcClient(url, timeout_s)
        self._blocks: dict[int, dict] = {}

    def _block(self, height: int) -> dict:
        blk = self._blocks.get(height)
        if blk is None:
            h = _require(
                self.client.call("getblockhash", [height]), f"block hash {height}"
            )
            blk = _require(self.client.call("getblock", [h, 1]), f"block {height}")
            if len(self._blocks) > 64:
                self._blocks.clear()
            self._blocks[height] = blk
        return blk

    def head(self) -> int:
        # the reference resolves the best hash then reads its block
        # (bitcoin.rs:196-201)
        best = _require(self.client.call("getbestblockhash", []), "best block hash")
        blk = _require(self.client.call("getblock", [best, 1]), "best block")
        return int(blk["height"])

    def block(self, height: int, fork: bool = False) -> dict:
        j = self._block(height)
        return {
            "height": height,
            "hash": j["hash"],
            "parent": j.get("previousblockhash", "GENESIS"),
            "transactions": list(j.get("tx") or []),
        }

    def block_json(self, height: int, fork: bool = False) -> bytes:
        return _compact(self._block(height))

    def block_timestamp_ms(self, height: int) -> int:
        return int(self._block(height)["time"]) * 1000

    def block_hash(self, height: int, fork: bool = False) -> str:
        return self._block(height)["hash"]

    def tx_ids(self, height: int) -> list[str]:
        return list(self._block(height).get("tx") or [])

    def uncles(self, height: int, fork: bool = False) -> list[bytes]:
        return []

    def tx_details(self, height: int, txid: str) -> dict:
        return {
            "json": self.tx_json(height, txid),
            "raw": self.tx_raw(txid),
            "from": None,
            "to": None,
            "receiptJson": None,
        }

    def tx_json(self, height: int, txid: str) -> bytes:
        return _compact(
            _require(self.client.call("getrawtransaction", [txid, True]), f"tx {txid}")
        )

    def tx_raw(self, txid: str) -> bytes:
        raw_hex = _require(
            self.client.call("getrawtransaction", [txid, False]), f"raw tx {txid}"
        )
        return bytes.fromhex(raw_hex)

    def trace_json(self, txid: str) -> bytes:
        raise NotImplementedError("Traces are not supported for Bitcoin")

    def state_diff_json(self, txid: str) -> bytes:
        raise NotImplementedError("Traces are not supported for Bitcoin")
