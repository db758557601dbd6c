"""Deterministic mock blockchain provider (reference ``src/blockchain/mock.rs``).

Generation pattern mirrors the reference's e2e fixtures
(``compact.rs:809-826``): ``hash = 'B{h}'``, ``parent = 'B{h-1}'``, 2-3 txes
per block named ``'TX{h}-{i}'``; the full mock block is embedded as the
``json`` payload so ``from_json`` recovers the tx list exactly the way the
real engine parses chain JSON. Forks: heights listed in ``fork_at`` produce
an alternative block ``'F{h}'`` alongside the canonical one.

The provider interface is the engine's per-chain plugin surface (SURVEY §2.10):
``blockchain_type/blockchain_id``, ``head()``, ``block(height)``,
``txes(block)``, ``traces(block)``, ``block_json_schema``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..schemas import MOCK_BLOCK_JSON_SCHEMA


@dataclass(frozen=True)
class MockChain:
    head_height: int = 1_000_000
    txs_per_block: int = 2  # plus one extra on odd heights
    fork_at: frozenset[int] = field(default_factory=frozenset)
    uncle_at: frozenset[int] = field(default_factory=frozenset)
    blockchain_type: str = "ETHEREUM"
    blockchain_id: str = "ETH"
    block_json_schema = MOCK_BLOCK_JSON_SCHEMA
    tx_list_field = "transactions"

    def head(self) -> int:
        return self.head_height

    def block_hash(self, height: int, fork: bool = False) -> str:
        # 64-hex like real chain hashes (the filename fork qualifier requires it)
        import hashlib

        return hashlib.sha256(f"{'F' if fork else 'B'}{height}".encode()).hexdigest()

    def tx_ids(self, height: int) -> list[str]:
        n = self.txs_per_block + (height % 2)
        return [f"TX{height}-{i}" for i in range(n)]

    def block(self, height: int, fork: bool = False) -> dict:
        return {
            "height": height,
            "hash": self.block_hash(height, fork),
            "parent": self.block_hash(height - 1) if height > 0 else "GENESIS",
            "transactions": self.tx_ids(height),
        }

    def block_json(self, height: int, fork: bool = False) -> bytes:
        return json.dumps(self.block(height, fork)).encode()

    def block_timestamp_ms(self, height: int) -> int:
        # deterministic 12-second block time from a fixed genesis
        return (1_600_000_000 + height * 12) * 1000

    def uncles(self, height: int, fork: bool = False) -> list[bytes]:
        """Uncle payloads for heights in ``uncle_at`` (ethereum.rs:243-248)."""
        if height in self.uncle_at:
            return [
                json.dumps(
                    {"hash": self.block_hash(height, fork=True), "number": height - 1}
                ).encode()
            ]
        return []

    def tx_details(self, height: int, txid: str) -> dict:
        """Full tx surface incl. deterministic from/to addresses
        (avros.rs:58-75: the schema's Ethereum-only columns)."""
        import hashlib

        frm = "0x" + hashlib.sha256(f"from:{txid}".encode()).hexdigest()[:40]
        to = "0x" + hashlib.sha256(f"to:{txid}".encode()).hexdigest()[:40]
        return {
            "json": self.tx_json(height, txid),
            "raw": self.tx_raw(txid),
            "from": frm,
            "to": to,
            "receiptJson": self.receipt_json(txid),
        }

    def tx_json(self, height: int, txid: str) -> bytes:
        return json.dumps({"hash": txid, "blockNumber": height}).encode()

    def tx_raw(self, txid: str) -> bytes:
        return f"raw:{txid}".encode()

    def receipt_json(self, txid: str) -> bytes:
        return json.dumps({"transactionHash": txid, "status": "0x1"}).encode()

    def trace_json(self, txid: str) -> bytes:
        return json.dumps({"type": "CALL", "tx": txid}).encode()

    def state_diff_json(self, txid: str) -> bytes:
        return json.dumps({"post": {"tx": txid}}).encode()
