"""Filename codec spec (reference filenames.rs:222-408 test intents)."""

from dshackle_archive_spark.core import (
    DataKind,
    Range,
    level1_dir,
    level2_dir,
    pad9,
    parse_filename,
    range_file_path,
    single_file_path,
)

H = 21_596_362
HASH = "a" * 64


def test_pad_levels():
    assert pad9(H) == "021596362"
    assert level1_dir(H) == "021000000"
    assert level2_dir(H) == "021596000"
    assert pad9(5) == "000000005"


def test_single_path_roundtrip():
    p = single_file_path(H, DataKind.BLOCKS)
    assert p == "021000000/021596000/021596362.block.avro"
    fi = parse_filename("archive/eth/" + p)
    assert fi.kind == DataKind.BLOCKS
    assert fi.range == Range(H, H)
    assert fi.hash is None


def test_single_path_with_hash():
    p = single_file_path(H, DataKind.TRANSACTIONS, block_hash=HASH)
    assert p.endswith(f"021596362.{HASH}.txes.avro")
    fi = parse_filename(p)
    assert fi.kind == DataKind.TRANSACTIONS
    assert fi.hash == HASH


def test_range_path_roundtrip():
    p = range_file_path(Range(723_745, 723_749), DataKind.BLOCKS)
    assert p == "000000000/range-000723745_000723749.blocks.avro"
    fi = parse_filename("btc/" + p)
    assert fi.kind == DataKind.BLOCKS
    assert fi.range == Range(723_745, 723_749)


def test_all_kind_exts():
    assert parse_filename("x/000000001.block.avro").kind == DataKind.BLOCKS
    assert parse_filename("x/000000001.txes.avro").kind == DataKind.TRANSACTIONS
    assert parse_filename("x/000000001.traces.avro").kind == DataKind.TRACES
    assert parse_filename("x/range-000000001_000000002.blocks.avro").kind == DataKind.BLOCKS
    assert parse_filename("x/range-000000001_000000002.traces.parquet").kind == DataKind.TRACES


def test_foreign_files_skipped():
    assert parse_filename("x/README.md") is None
    assert parse_filename("x/000000001.block.csv") is None
    assert parse_filename("x/range-1_2.chunks.avro") is None


def test_lenient_reference_grammar():
    """filenames.rs RE_SINGLE accepts unpadded heights and a codec segment;
    reference-valid files must not be dropped from inventory as foreign."""
    fi = parse_filename("x/123.block.avro")  # unpadded height
    assert fi.kind == DataKind.BLOCKS and fi.range == Range(123, 123)
    fi = parse_filename("x/000000123.block.snappy.avro")  # codec segment
    assert fi.kind == DataKind.BLOCKS and fi.range == Range(123, 123)
    fi = parse_filename(f"x/000000123.{HASH}.txes.zstd.avro")  # hash + codec
    assert fi.kind == DataKind.TRANSACTIONS and fi.hash == HASH
    fi = parse_filename("x/range-100_199.blocks.zstd.avro")
    assert fi.kind == DataKind.BLOCKS and fi.range == Range(100, 199)
