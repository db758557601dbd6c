"""Import the reference's REAL mainnet Avro fixtures into the native layout
and analyze them with the engine — the end-to-end migration story."""

import os

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.sources.archive import read_table, register_archive_views
from dshackle_archive_spark.sources.import_archive import import_reference_archive

FIXTURES = "/root/reference/testdata/fullAvroFiles"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available"
)


def test_import_real_btc_fixtures(spark, tmp_path):
    res = import_reference_archive(
        spark, FIXTURES, str(tmp_path), "BTC", tables=("blocks", "transactions")
    )
    # flat singles + the btc/ range files all import (ethereum/ files too —
    # same schema family; kind is determined by the name codec)
    assert res.files["blocks"] >= 9 and res.files["transactions"] >= 5
    blocks = read_table(spark, str(tmp_path), "BTC", "blocks")
    hs = sorted(r["height"] for r in blocks.select("height").collect())
    assert 723743 in hs and 723745 in hs  # single + range-file content
    # partition columns derived correctly
    assert {r["l2"] for r in blocks.select("l2").distinct().collect()} >= {723000}

    # the real data passes the engine's own integrity shape: every txes row's
    # txid appears in its block's embedded JSON tx list
    register_archive_views(spark, str(tmp_path), "BTC", tables=("blocks", "transactions"))
    # (the fixture tree mixes chains; blockchainType is exactly the column
    # that separates them — BTC blocks embed `tx`, ETH embeds `transactions`)
    bad = spark.sql(
        """
        WITH expected AS (
          SELECT height, explode(from_json(CAST(json AS STRING), 'tx array<string>').tx) AS txid
          FROM btc_blocks WHERE blockchainType = 'BITCOIN'
        )
        SELECT t.txid FROM btc_transactions t
        LEFT ANTI JOIN expected e ON t.height = e.height AND t.txid = e.txid
        WHERE t.blockchainType = 'BITCOIN'
        """
    ).count()
    assert bad == 0

    # analytics over real mainnet data: txes per imported block
    per_block = spark.sql(
        """
        SELECT b.height, count(t.txid) AS n_tx
        FROM btc_blocks b LEFT JOIN btc_transactions t ON b.height = t.height
        GROUP BY b.height ORDER BY b.height
        """
    ).collect()
    by_h = {r["height"]: r["n_tx"] for r in per_block}
    assert by_h[723744] == 423  # the golden fixture count


def test_import_range_bounded(spark, tmp_path):
    from dshackle_archive_spark.core import Range

    res = import_reference_archive(
        spark, FIXTURES, str(tmp_path), "BTC", tables=("blocks",), rng=Range(723745, 723749)
    )
    blocks = read_table(spark, str(tmp_path), "BTC", "blocks")
    hs = sorted(r["height"] for r in blocks.select("height").collect())
    assert hs == [723745, 723746, 723747, 723748, 723749]
    assert res.rows["blocks"] == 5
