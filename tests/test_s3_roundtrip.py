"""Object-store round-trip over a real (stubbed) S3 HTTP endpoint.

Rounds ≤4 left this seam untested: `ref_layout` writes and archive listings
accepted URI roots via pyarrow, but no S3-compatible endpoint had ever
served them. These tests run the actual S3 REST protocol — multipart
uploads, ranged GETs, ListObjectsV2 — against `stub_s3`'s in-memory store
(reference exercises the same seam in-memory: ``objects.rs:388-611``).
"""

import io

import pytest

import pyarrow.fs as pafs
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dshackle_archive_spark.core import DataKind, Range
from dshackle_archive_spark.sources import archive as ARC
from dshackle_archive_spark.sources import ref_layout as RL
from dshackle_archive_spark.sources.fetcher import FetchPolicy, fetch_blocks
from dshackle_archive_spark.sources.mock_chain import MockChain
from stub_s3 import start_s3_stub

CHAIN = MockChain(head_height=10_000)
POLICY = FetchPolicy(parallel=4)


@pytest.fixture()
def s3():
    endpoint, srv = start_s3_stub()
    host = endpoint[len("http://") :]
    q = f"endpoint_override={host}&scheme=http&allow_bucket_creation=true"
    root = f"s3://k:s@archive/cold?{q}"
    yield root, srv
    srv.shutdown()


def _blocks_df(spark, n=20):
    return fetch_blocks(spark, CHAIN, Range(0, n - 1), POLICY)


def test_range_files_write_list_read_on_s3(spark, s3):
    root, srv = s3
    df = _blocks_df(spark)
    res = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 19)
    ).collect()
    assert len(res) == 2 and all(not r["skipped"] for r in res)
    # the writer really spoke multipart S3, not a local fallback
    assert srv.requests.get("CompleteMultipartUpload", 0) >= 2

    # list through the same endpoint and parse the inventory
    inv = ARC.inventory_df(spark, root, "ETH")
    rows = {(r["kind"], r["start"], r["end"]) for r in inv.collect()}
    assert rows == {("blocks", 0, 9), ("blocks", 10, 19)}

    # read an object back (ranged-GET path) and check content fidelity
    fs, base = pafs.FileSystem.from_uri(root)
    key = f"{base}/eth/" + inv.orderBy("start").first()["path"].split("eth/")[-1]
    with fs.open_input_file(key) as f:
        table = pq.read_table(f)
    assert table.column("height").to_pylist() == list(range(10))
    assert srv.requests.get("GetObject", 0) >= 1


def test_s3_write_is_idempotent_without_overwrite(spark, s3):
    root, srv = s3
    df = _blocks_df(spark, 10)
    first = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 9)
    ).collect()
    again = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 9)
    ).collect()
    assert [r["skipped"] for r in first] == [False]
    assert [r["skipped"] for r in again] == [True]  # S13 skip-if-exists via HEAD
    assert srv.requests.get("HeadObject", 0) >= 1


def test_single_files_on_s3(spark, s3):
    """Stream-mode single-block files (T5 fork tolerance) on an object
    store: one PUT-committed object per height, inventory parses back."""
    root, srv = s3
    df = _blocks_df(spark, 3)
    RL.write_single_files(df, root, "ETH", DataKind.BLOCKS).collect()
    inv = ARC.inventory_df(spark, root, "ETH")
    got = {(r["start"], r["end"]) for r in inv.collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}
    # every file is a real object in the store, under the chain prefix
    keys = {k for (_b, k) in srv.objects if k.endswith(".parquet")}
    assert len(keys) == 3 and all(k.startswith("cold/eth/") for k in keys)
