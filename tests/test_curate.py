"""End-to-end curation pipeline: planted junk, duplicates, and benchmark
leaks must each be removed by their stage, attrition counts must be
monotone, and the run must be byte-reproducible."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dshackle_archive_spark.plans.curate_plan import curate


def _corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    planted = [
        # exact duplicate of doc 3 (id far outside the real range)
        (900001, None, 3),
        # junk: too short
        (900002, "tiny", None),
        # junk: no stopwords
        (900003, "zrqx " * 40, None),
    ]
    base3 = docs.filter("doc_id = 3").select("text").collect()[0]["text"]
    extra = spark.createDataFrame(
        [
            (900001, base3),
            (900002, "tiny"),
            (900003, ("zrqx " * 40).strip()),
            # near-duplicate of doc 3: same text plus two tokens
            (900004, base3 + " tail tok"),
        ],
        "doc_id long, text string",
    )
    return docs.unionByName(extra)


def test_curate_removes_planted_problems(spark, sf_dir, tmp_path):
    docs = _corpus(spark, sf_dir)
    bench = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id % 29 = 0"
    ).select("doc_id", "text")
    corpus = docs.filter("doc_id % 29 != 0 or doc_id > 899999")

    out, res = curate(
        corpus, benchmark=bench, output_path=str(tmp_path / "curated")
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}

    # junk removed by quality stage
    assert 900002 not in ids and 900003 not in ids
    # the exact-dup pair (3, 900001): exactly one survives
    assert len(ids & {3, 900001}) <= 1
    # the near-dup of doc 3: the longest one wins, the other is gone
    assert not {3, 900004} <= ids
    # attrition is monotone and recorded stage by stage
    c = res.stage_counts
    assert c["input"] >= c["quality"] >= c["exact_dedup"] >= c["neardup"] >= c["decontaminated"]
    assert c["decontaminated"] == len(ids)
    # decontamination actually dropped full copies of benchmark docs
    # (the corpus contains exact dups of benchmark docs via the planted id)
    assert c["decontaminated"] <= c["neardup"]

    # partitioned write by split
    parts = {p.split("split=")[1].split("/")[0] for p in glob.glob(str(tmp_path / "curated/split=*"))}
    assert parts == {"train", "val", "test"}


def test_curate_is_reproducible(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    out1, _ = curate(docs)
    out2, _ = curate(docs)
    a = sorted((r["doc_id"], r["split"]) for r in out1.select("doc_id", "split").collect())
    b = sorted((r["doc_id"], r["split"]) for r in out2.select("doc_id", "split").collect())
    assert a == b and len(a) > 0


def test_curate_no_benchmark_skips_stage(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    _, res = curate(docs)
    assert "decontaminated" not in res.stage_counts


def test_curate_cli_end_to_end(spark, sf_dir, tmp_path):
    """CLI drive: curate the real documents parquet, JSON stats line out,
    partitioned output in place."""
    import io
    import json
    from contextlib import redirect_stdout

    from dshackle_archive_spark.cli import main

    out = str(tmp_path / "cli_curated")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--benchmark", f"{sf_dir}/documents.parquet",
            "--output", out,
        ])
    assert rc == 0
    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["command"] == "curate"
    assert line["stages"]["input"] > 0
    assert line["stages"]["decontaminated"] == 0  # benchmark == corpus → all leak
    assert line["output"] == out


def test_curate_writes_audit_manifest(spark, sf_dir, tmp_path):
    import json

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = str(tmp_path / "with_manifest")
    _, res = curate(docs, output_path=out, min_stopword_ratio=0.0)
    m = json.load(open(f"{out}/_MANIFEST.json"))
    assert m["stages"] == res.stage_counts
    assert m["params"]["min_stopword_ratio"] == 0.0
    assert m["params"]["decontaminated"] is False


def test_curate_empty_input(spark, tmp_path):
    """An empty corpus must flow through every stage without error: zero
    counts, a valid manifest, no split partitions."""
    import json

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty_out")
    df, res = curate(empty, output_path=out)
    assert df.count() == 0
    assert res.stage_counts == {
        "input": 0, "quality": 0, "exact_dedup": 0, "neardup": 0
    }
    m = json.load(open(f"{out}/_MANIFEST.json"))
    assert m["stages"]["input"] == 0


def test_curate_incremental_admits_only_new_content(spark, sf_dir, tmp_path):
    """Incremental batch against a curated corpus: exact copies and
    near-dups of PRIOR docs are dropped via the persisted index, junk is
    quality-filtered, fresh docs are appended; the manifest stays a
    cumulative audit record."""
    from dshackle_archive_spark.plans.curate_plan import curate_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base = docs.filter("doc_id < 120")
    root = str(tmp_path / "curated")
    _, base_res = curate(base, output_path=root, min_stopword_ratio=0.0)
    base_n = base_res.stage_counts["neardup"]

    prior5 = base.filter("doc_id = 5").collect()[0]["text"]
    prior7 = base.filter("doc_id = 7").collect()[0]["text"]
    fresh = docs.filter("doc_id >= 200 and doc_id < 220")
    planted = spark.createDataFrame(
        [
            (910001, prior5),              # exact copy of prior corpus doc
            (910002, prior7 + " zz yy"),   # near-dup of prior corpus doc
            (910003, "tiny"),              # junk (quality)
        ],
        "doc_id long, text string",
    )
    batch = fresh.unionByName(planted)

    out, res = curate_incremental(batch, root, min_stopword_ratio=0.0)
    c = res.stage_counts
    assert c["input"] == 23
    assert c["quality"] == c["input"] - 1              # junk dropped
    assert c["prior_exact"] == c["exact_dedup"] - 1    # exact copy dropped
    assert c["prior_neardup"] <= c["neardup"] - 1      # near-dup dropped
    admitted_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 910001 not in admitted_ids
    assert 910002 not in admitted_ids
    assert 910003 not in admitted_ids

    # the corpus on disk = base survivors + admitted batch docs
    on_disk = spark.read.parquet(root)
    assert on_disk.count() == base_n + c["prior_neardup"]

    # manifest: cumulative total + one increment record
    import json

    man = json.loads((tmp_path / "curated" / "_MANIFEST.json").read_text())
    assert man["total_docs"] == base_n + c["prior_neardup"]
    assert len(man["increments"]) == 1
    assert man["increments"][0]["admitted"] == c["prior_neardup"]

    # idempotence of content: re-sending the same fresh TEXT under new ids
    # admits nothing (caught by the now-grown hash index)
    resend = fresh.select(
        (F.col("doc_id") + 920000).alias("doc_id"), "text"
    )
    _, res2 = curate_incremental(resend, root, min_stopword_ratio=0.0)
    assert res2.stage_counts["prior_exact"] == 0
    man2 = json.loads((tmp_path / "curated" / "_MANIFEST.json").read_text())
    assert man2["total_docs"] == man["total_docs"]
    assert len(man2["increments"]) == 2


def test_curate_cli_incremental(spark, sf_dir, tmp_path):
    """CLI drive of the incremental path: base curate, then --incremental
    with a batch parquet; survivors append and the manifest gains an
    increment."""
    import io
    import json
    from contextlib import redirect_stdout

    from dshackle_archive_spark.cli import main

    out = str(tmp_path / "cli_inc")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    base_p = str(tmp_path / "base.parquet")
    batch_p = str(tmp_path / "batch.parquet")
    docs.filter("doc_id < 100").write.parquet(base_p)
    docs.filter("doc_id >= 100 and doc_id < 130").write.parquet(batch_p)

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["curate", "--input", base_p, "--output", out]) == 0
        assert main(["curate", "--input", batch_p, "--output", out,
                     "--incremental"]) == 0
    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["incremental"] is True
    assert "prior_neardup" in line["stages"]
    man = json.loads((tmp_path / "cli_inc" / "_MANIFEST.json").read_text())
    assert len(man["increments"]) == 1


def test_curate_snapshot_transactional_increments(spark, sf_dir, tmp_path):
    """snapshot=True: every curate/incremental commit is one manifest
    publish — readers pin a version (time travel works), stray files not
    in the manifest are invisible, and the next incremental resolves the
    dedup index through the manifest too."""
    from dshackle_archive_spark.plans.curate_plan import (
        curate_incremental,
        read_curated,
    )
    from dshackle_archive_spark.sources import snapshots as SNAP

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    root = str(tmp_path / "snapcorpus")
    _, base_res = curate(
        docs.filter("doc_id < 100"), output_path=root,
        snapshot=True, min_stopword_ratio=0.0,
    )
    base_n = base_res.stage_counts["neardup"]
    assert SNAP.current_version(root) == 1
    assert read_curated(spark, root).count() == base_n
    assert set(read_curated(spark, root).columns) >= {"doc_id", "text", "split"}

    batch = docs.filter("doc_id >= 200 and doc_id < 215")
    _, inc = curate_incremental(
        batch, root, snapshot=True, min_stopword_ratio=0.0
    )
    admitted = inc.stage_counts["prior_neardup"]
    assert SNAP.current_version(root) == 2
    assert read_curated(spark, root).count() == base_n + admitted
    # time travel: v1 is still exactly the base corpus
    assert read_curated(spark, root, version=1).count() == base_n

    # a torn/garbage file beside the data is invisible to manifest readers
    import glob as _g
    import shutil

    docs.filter("doc_id < 3").write.mode("overwrite").parquet(
        str(tmp_path / "stray")
    )
    stray_dir = _g.glob(str(tmp_path / "snapcorpus" / "data" / "*" / "split=*"))[0]
    src = _g.glob(str(tmp_path / "stray" / "*.parquet"))[0]
    shutil.copy(src, stray_dir + "/part-stray.parquet")
    assert read_curated(spark, root).count() == base_n + admitted

    # re-sent content is rejected via the manifest-resolved index
    resend = batch.select((F.col("doc_id") + 500000).alias("doc_id"), "text")
    _, inc2 = curate_incremental(
        resend, root, snapshot=True, min_stopword_ratio=0.0
    )
    assert inc2.stage_counts["prior_exact"] == 0
    assert SNAP.current_version(root) == 3
    assert read_curated(spark, root).count() == base_n + admitted


def test_curate_snapshot_orphan_listing(spark, sf_dir, tmp_path):
    """A crashed commit's never-published files are reported by
    list_orphans (and pinned readers never saw them); published files are
    not reported."""
    from dshackle_archive_spark.plans.curate_plan import list_orphans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    root = str(tmp_path / "oc")
    curate(docs.filter("doc_id < 60"), output_path=root,
           snapshot=True, min_stopword_ratio=0.0)
    assert list_orphans(root) == []

    # simulate a crash mid-commit: batch data written, manifest never
    # published
    docs.filter("doc_id < 5").withColumn("split", F.lit("train")).write.parquet(
        str(tmp_path / "oc" / "data" / "b_crashed")
    )
    orph = list_orphans(root)
    assert orph and all(o.startswith("data/b_crashed") for o in orph)


def test_curate_strip_passages_stage(spark, sf_dir):
    """strip_passages=True removes corpus-repeated passages BEFORE exact
    dedup, so docs differing only in boilerplate collapse to one survivor;
    boilerplate text itself never reaches the output."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # 12-token boilerplate unit, planted twice -> EXACTLY two full
    # 12-token segments, so stripping leaves no residue tokens
    plate = (
        "this document is provided as is without warranty of any kind ever "
    )
    plate3 = plate * 2
    # plant the same boilerplate prefix on every 6th doc, and TWO docs that
    # are identical except for the boilerplate (dedup must collapse them).
    # The base doc must itself survive the quality stage, so pick one that
    # does rather than hardcoding an id.
    from dshackle_archive_spark.plans.curate_plan import quality_filter

    base_row = (
        quality_filter(docs)
        .filter("doc_id % 6 != 0")
        .orderBy("doc_id")
        .select("doc_id", "text")
        .first()
    )
    base_id, base = base_row["doc_id"], base_row["text"]
    planted = spark.createDataFrame(
        [(910001, plate3 + base), (910002, base)],
        "doc_id long, text string",
    )
    corpus = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 6 == 0, F.concat(F.lit(plate3), F.col("text"))
        ).otherwise(F.col("text")),
    ).unionByName(planted)

    out, res = curate(corpus, strip_passages=True)
    c = res.stage_counts
    assert "passage_strip" in c and c["quality"] >= c["passage_strip"]

    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    # the boilerplate-only difference collapsed in exact dedup: only one of
    # (base_id, 910001, 910002) — all the same content class — survives
    assert len(ids & {base_id, 910001, 910002}) == 1
    # no surviving text contains a full boilerplate segment
    seg = "this document is provided as is without warranty of any kind"
    assert all(seg not in (r["text"] or "") for r in rows)

    # default OFF: stage absent, boilerplate untouched
    out2, res2 = curate(corpus)
    assert "passage_strip" not in res2.stage_counts
    assert any(seg in (r["text"] or "") for r in out2.collect())


def test_curate_incremental_strip_passages_cumulative(spark, sf_dir, tmp_path):
    """Cross-increment boilerplate: a passage below min_df within the new
    batch is still stripped because the prior corpus's persisted segment-df
    store pushes its CUMULATIVE df over the threshold; without the store
    (control) the same batch keeps it."""
    import shutil

    from dshackle_archive_spark.plans.curate_plan import curate_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plate = (
        "this document is provided as is without warranty of any kind ever "
    ) * 2  # exactly two 12-token segments
    seg = "this document is provided as is without warranty of any kind ever"

    base = docs.filter("doc_id < 300").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 6 == 0, F.concat(F.lit(plate), F.col("text"))
        ).otherwise(F.col("text")),
    )
    root = str(tmp_path / "corpus")
    out, res = curate(base, output_path=root, strip_passages=True)
    assert res.stage_counts["passage_strip"] > 0

    # batch: TWO planted docs (batch df 2 < min_df 5) on fresh,
    # quality-passing base texts not present in the prior corpus
    from dshackle_archive_spark.plans.curate_plan import quality_filter

    carrier_ids = [
        r["doc_id"]
        for r in quality_filter(docs.filter("doc_id >= 300"))
        .orderBy("doc_id")
        .select("doc_id")
        .limit(2)
        .collect()
    ]
    carriers = (
        docs.filter(F.col("doc_id").isin(carrier_ids))
        .select(
            (F.col("doc_id") + 700000).alias("doc_id"),
            F.concat(F.lit(plate), F.col("text")).alias("text"),
        )
    )
    planted_ids = [i + 700000 for i in carrier_ids]
    batch = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 360)
        & ~F.col("doc_id").isin(carrier_ids)
    ).unionByName(carriers)

    out2, res2 = curate_incremental(
        batch, root, strip_passages=True
    )
    rows = {r["doc_id"]: r["text"] for r in out2.collect()}
    admitted_carriers = [d for d in planted_ids if d in rows]
    assert admitted_carriers, "carriers should pass quality and be admitted"
    assert all(seg not in rows[d] for d in admitted_carriers), (
        "prior-corpus df must strip the passage even at batch df 2"
    )

    # control: same batch against the same base but WITHOUT the store
    root2 = str(tmp_path / "corpus_nostore")
    curate(base, output_path=root2, strip_passages=True)
    shutil.rmtree(f"{root2}/_index/segments")
    out3, _ = curate_incremental(batch, root2, strip_passages=True)
    rows3 = {r["doc_id"]: r["text"] for r in out3.collect()}
    kept = [d for d in planted_ids if d in rows3]
    assert any(seg in rows3[d] for d in kept), (
        "without the store the batch-scoped df (2) must NOT strip"
    )

    # the store accumulated the batch's observed segments
    import glob as _g

    seg_store = spark.read.parquet(f"{root}/_index/segments")
    assert seg_store.count() > 0


def test_corpus_report_card(spark, sf_dir, tmp_path, capsys):
    """The report plan's numbers must agree with direct computation, and
    the CLI must emit them as one JSON object."""
    import json

    from dshackle_archive_spark.plans.report_plan import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plant exact dups + boilerplate so those sections are non-trivial
    plate = (
        "this document is provided as is without warranty of any kind ever "
    ) * 2
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 6 == 0, F.concat(F.lit(plate), F.col("text"))
        ).otherwise(F.col("text")),
    )
    extra = planted.filter("doc_id < 10").select(
        (F.col("doc_id") + 800000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    corpus = planted.unionByName(extra)

    rep = corpus_report(corpus)
    n = corpus.count()
    assert rep["n_docs"] == n
    assert rep["total_tokens"] > 0
    # 10 planted dup pairs -> 20 docs in non-unique hash classes
    assert rep["exact_dup_rate"] == round(20 / n, 6)
    assert 0 < rep["quality_pass_rate"] < 1
    assert sum(x["n_docs"] for x in rep["languages"]) == n
    assert sum(x["n_docs"] for x in rep["sources"]) == n
    # the planted plate segment dominates boilerplate df (its two
    # occurrences per doc share one text, hence ONE df row)
    assert len(rep["boilerplate"]) >= 1
    seg0 = "this document is provided as is without warranty of any kind ever"
    expect_df = corpus.filter(F.col("text").contains(seg0)).count()
    import hashlib as _h

    assert rep["boilerplate"][0] == {
        "df": expect_df,
        "seg_hash": _h.md5(seg0.encode()).hexdigest(),
    }
    tl = rep["token_length"]
    assert tl["min"] <= tl["p50"] <= tl["max"]

    # wave-5/6 sections: novelty drops below 1 with planted dups; the 10
    # verbatim copies keep the same source so the natural cross-source
    # matrix stays empty; no code-shaped docs in this corpus; bursty terms
    # include the planted plate vocabulary (each plate word appears 2x per
    # containing doc minimum)
    assert 0 < rep["ngram_novelty"] < 1
    assert rep["code_frac"] == 0.0
    assert rep["cross_source_dup"] == []
    assert len(rep["bursty_terms"]) >= 1
    bvals = [b["burstiness"] for b in rep["bursty_terms"]]
    assert all(v >= 1.0 for v in bvals)
    assert bvals == sorted(bvals, reverse=True)
    assert all(b["tf"] >= b["df"] for b in rep["bursty_terms"])

    # CLI round-trip
    from dshackle_archive_spark.cli import main

    path = str(tmp_path / "report_in.parquet")
    corpus.write.parquet(path)
    rc = main(["report", "--input", path, "--master", "local[4]"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["command"] == "report"
    assert out["n_docs"] == rep["n_docs"]
    assert out["exact_dup_rate"] == rep["exact_dup_rate"]
