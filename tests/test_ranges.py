"""Unit corpus for the interval kernel.

Mirrors the reference's highest-value spec: ``range.rs:311-666`` and
``range_bag.rs:136-321`` test intents (split/contains/intersect/cut/parse,
bag union & subtraction) — re-derived, not translated.
"""

import pytest

from dshackle_archive_spark.core import (
    Range,
    merge_ranges,
    parse_range,
    subtract_ranges,
)


def test_parse():
    assert parse_range("100") == Range(100, 100)
    assert parse_range("100..200") == Range(100, 200)
    assert parse_range(" 0..5 ") == Range(0, 5)


def test_invalid():
    with pytest.raises(ValueError):
        Range(5, 4)
    with pytest.raises(ValueError):
        Range(-1, 4)


def test_len_contains():
    r = Range(10, 19)
    assert len(r) == 10
    assert 10 in r and 19 in r and 9 not in r and 20 not in r
    assert r.contains_range(Range(12, 15))
    assert not r.contains_range(Range(12, 25))


def test_intersect_connected():
    assert Range(1, 5).intersects(Range(5, 9))
    assert not Range(1, 5).intersects(Range(6, 9))
    # adjacency is connected but not intersecting
    assert Range(1, 5).is_connected_to(Range(6, 9))
    assert not Range(1, 5).is_connected_to(Range(7, 9))
    assert Range(1, 5).join(Range(6, 9)) == Range(1, 9)


def test_intersection():
    assert Range(1, 10).intersection(Range(5, 20)) == Range(5, 10)
    assert Range(1, 4).intersection(Range(5, 20)) is None


def test_cut():
    assert Range(1, 10).cut(Range(4, 6)) == [Range(1, 3), Range(7, 10)]
    assert Range(1, 10).cut(Range(1, 5)) == [Range(6, 10)]
    assert Range(1, 10).cut(Range(5, 10)) == [Range(1, 4)]
    assert Range(1, 10).cut(Range(1, 10)) == []
    assert Range(1, 10).cut(Range(20, 30)) == [Range(1, 10)]
    assert Range(1, 10).cut(Range(0, 100)) == []


def test_split_chunks_unaligned():
    # boundaries at absolute multiples of chunk (reference range.rs:220-261)
    assert Range(1500, 3700).split_chunks(1000) == [
        Range(1500, 1999),
        Range(2000, 2999),
        Range(3000, 3700),
    ]
    assert Range(0, 999).split_chunks(1000) == [Range(0, 999)]
    assert Range(5, 5).split_chunks(1000) == [Range(5, 5)]


def test_split_chunks_aligned():
    # compaction only builds full boundary-aligned chunks
    assert Range(1500, 3700).split_chunks(1000, aligned=True) == [Range(2000, 2999)]
    assert Range(1000, 2999).split_chunks(1000, aligned=True) == [
        Range(1000, 1999),
        Range(2000, 2999),
    ]
    assert Range(1001, 2999).split_chunks(1000, aligned=True) == [Range(2000, 2999)]
    assert Range(1500, 1700).split_chunks(1000, aligned=True) == []


def test_up_to():
    # stream --continue backfill window (stream.rs:43-47)
    assert Range(500, 500).up_to(100) == Range(400, 499)
    assert Range(50, 50).up_to(100) == Range(0, 49)


def test_merge_ranges():
    assert merge_ranges([Range(5, 9), Range(1, 3), Range(4, 4)]) == [Range(1, 9)]
    assert merge_ranges([Range(1, 2), Range(10, 12), Range(11, 15)]) == [
        Range(1, 2),
        Range(10, 15),
    ]
    assert merge_ranges([]) == []


def test_subtract_ranges():
    # gap detection core: requested − covered (storage/mod.rs:148-160)
    assert subtract_ranges([Range(0, 100)], [Range(10, 20), Range(30, 40)]) == [
        Range(0, 9),
        Range(21, 29),
        Range(41, 100),
    ]
    assert subtract_ranges([Range(0, 10)], [Range(0, 10)]) == []
    assert subtract_ranges([Range(0, 10)], []) == [Range(0, 10)]
    # overlapping cuts merge before subtraction
    assert subtract_ranges([Range(0, 10)], [Range(2, 5), Range(4, 8)]) == [
        Range(0, 1),
        Range(9, 10),
    ]
