"""JSONL interchange: round-trip fidelity, gzip shards, explicit-schema
reads, corrupt-line quarantine."""

import gzip
import os

from pyspark.sql import functions as F

from dshackle_archive_spark.sources.jsonl import (
    DOCS_JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_gzip_shards(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, compression="gzip", shards=4)

    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 4  # shard knob respected, gzip applied

    clean, quarantine = read_jsonl(spark, out)
    assert quarantine.count() == 0
    assert clean.columns == [f.name for f in DOCS_JSONL_SCHEMA.fields]
    # value-exact round trip (text can hold any unicode the corpus had)
    a = sorted(tuple(r) for r in docs.select(*clean.columns).collect())
    b = sorted(tuple(r) for r in clean.collect())
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    good = '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}'
    with gzip.open(p / "shard0.json.gz", "wt") as f:
        f.write(good + "\n")
        f.write("{this is not json at all\n")
        f.write('{"doc_id": 2, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write('["wrong", "shape"]\n')

    clean, quarantine = read_jsonl(spark, str(p))
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert rows == {1: "hello world", 2: "ok"}
    assert len(bad) == 2
    assert any("not json" in b for b in bad)


def test_jsonl_read_never_infers(spark, sf_dir, tmp_path):
    """The reader must carry the caller's schema even over an empty dir
    slice — no inference pre-pass, no schema drift."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(0)
    out = str(tmp_path / "empty_jsonl")
    write_jsonl(docs.coalesce(1), out, compression="none")
    clean, _ = read_jsonl(spark, out)
    assert clean.schema == spark.createDataFrame([], DOCS_JSONL_SCHEMA).schema


def test_cli_report_reads_jsonl(spark, sf_dir, tmp_path, capsys):
    import json

    from dshackle_archive_spark.cli import main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "cli_jsonl")
    write_jsonl(docs, out, shards=2)
    rc = main(["report", "--input", out, "--input-format", "jsonl",
               "--master", "local[4]"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["command"] == "report"
    assert rep["quarantined_lines"] == 0
    assert rep["n_docs"] == docs.count()


def test_cli_curate_incremental_over_jsonl(spark, sf_dir, tmp_path):
    """The incremental curation path accepts JSONL batches end-to-end:
    base curate from one JSONL dir, then --incremental with a second —
    survivors append and the manifest gains an increment, exactly as
    with parquet inputs."""
    import io
    import json
    from contextlib import redirect_stdout

    from dshackle_archive_spark.cli import main

    out = str(tmp_path / "cli_inc_jsonl")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_j = str(tmp_path / "base_jsonl")
    batch_j = str(tmp_path / "batch_jsonl")
    write_jsonl(docs.filter("doc_id < 100"), base_j, shards=2)
    write_jsonl(docs.filter("doc_id >= 100 and doc_id < 130"), batch_j, shards=1)

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["curate", "--input", base_j,
                     "--input-format", "jsonl", "--output", out]) == 0
        assert main(["curate", "--input", batch_j,
                     "--input-format", "jsonl", "--output", out,
                     "--incremental"]) == 0
    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["incremental"] is True
    man = json.loads((tmp_path / "cli_inc_jsonl" / "_MANIFEST.json").read_text())
    assert len(man["increments"]) == 1


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    texts=st.lists(
        st.text(max_size=40),  # arbitrary unicode incl. newlines/quotes
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_jsonl_roundtrip_arbitrary_text(spark, texts):
    """Property test: JSONL escaping survives arbitrary unicode — embedded
    newlines, quotes, backslashes, control characters — value-exact both
    directions (the corrupt-line quarantine must stay EMPTY: we wrote
    valid JSON, nothing may be misclassified)."""
    import shutil
    import tempfile

    rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tempfile.mkdtemp(prefix="jsonl_prop_")
    try:
        write_jsonl(df.coalesce(1), out, compression="none")
        clean, quarantine = read_jsonl(spark, out)
        assert quarantine.count() == 0
        got = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert got == {i: t for i, t, *_ in rows}
    finally:
        shutil.rmtree(out, ignore_errors=True)
