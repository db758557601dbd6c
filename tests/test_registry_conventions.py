"""Registry-wide invariants that keep future queries driver-safe:
column names must be clean aliases (the driver sorts/hash-compares by name),
every query needs an oracle or a documented rows-only reason, and plans must
build without an action."""

import re

import __spark_entry__ as entrymod

# every registry query now carries a full value-level oracle (the LSH
# hyperplane hash and the multimodal feature stage are deterministic, so
# even those replay in SQL) — keep this set empty
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_query_has_oracle_or_is_allowed_rows_only():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert q - o == ROWS_ONLY_ALLOWED


def test_query_columns_are_clean_aliases(spark, sf_dir):
    bad = {}
    for name, fn in entrymod.queries().items():
        cols = fn(spark, sf_dir).columns  # plan build only, no action
        ugly = [c for c in cols if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c)]
        if ugly:
            bad[name] = ugly
    assert not bad, f"unaliased computed columns: {bad}"


def test_key_prefixes_map_to_survey_sections():
    valid = re.compile(r"^(s|p|j|a|w|c|e|h|t|d|x|v|m)\d+[a-z]?_")
    for name in entrymod.queries():
        assert valid.match(name), name
