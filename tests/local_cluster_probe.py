"""Subprocess body for the local-cluster smoke test (round-7 VERDICT task 6).

Runs registry queries + one curate cycle under ``local-cluster[2,2,2048]``
— REAL executor JVMs with real serialization boundaries, unlike
``local[N]``'s single JVM — to flush single-JVM assumptions: package
shipping to executor Python workers, localCheckpoint block placement,
broadcast exchange, ``file:`` path handling in the file sinks.

Usage: python local_cluster_probe.py <comma-queries> <sf_dir> <out.json> \
           [master] [mode]
Default master is ``local-cluster[2,2,2048]``; pass e.g.
``local-cluster[2,2,1024]`` for the memory-pressure variant. mode
``digest`` records {"cols", "n", "sha256"} per query (bounded output for
big result sets) and skips the curate cycle; the default records full
sorted rows + one curate cycle.
Writes {"queries": {name: {"cols": [...], "rows": [[str,...],...]}},
        "curate": {"survivors": N, "stages": {...}}} to out.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2]
    out_path = sys.argv[3]
    master = sys.argv[4] if len(sys.argv) > 4 else "local-cluster[2,2,2048]"
    mode = sys.argv[5] if len(sys.argv) > 5 else "rows"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    # local-cluster executors are launched via spark-class: needs SPARK_HOME
    import pyspark

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

    from dshackle_archive_spark.session import get_spark

    spark = get_spark("local-cluster-probe", master=master)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    import dshackle_archive_spark.queries as Q

    reg = Q.registry()
    out: dict = {"queries": {}, "curate": None}

    if mode == "curate_x8":
        # Round-10 task 5: the END-TO-END curate (strip-passages -> exact
        # dedup -> near-dup CC -> decontamination -> split) at x8-of-sf
        # documents under whatever master/memory the caller picked, with
        # per-stage wall time and a full-row digest for cross-session
        # parity. x8 corpus: 8 id-shifted copies, each with a distinct
        # appended token, so copies survive exact dedup (near-identical,
        # not identical) and the near-dup CC stage gets real 8-cliques.
        import hashlib

        from dshackle_archive_spark.plans.curate_plan import curate
        from dshackle_archive_spark.sources.tables import load_tables

        base = load_tables(spark, sf_dir)["documents"]
        from functools import reduce

        from pyspark.sql import functions as F

        copies = [
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
                "lang", "source", "n_chars",
            )
            for i in range(8)
        ]
        docs = reduce(lambda a, b: a.unionByName(b), copies)
        bench = base.filter("doc_id % 29 = 0").select("doc_id", "text")
        # output_path exercises the full sink under pressure too: the
        # split-partitioned parquet write, the _MANIFEST audit, and the
        # persisted segment-df _index
        with tempfile.TemporaryDirectory() as tmp:
            curated, res = curate(
                docs, benchmark=bench, strip_passages=True,
                output_path=os.path.join(tmp, "out"),
            )
            rows = sorted(
                [str(v) for v in r]
                for r in curated.select("doc_id", "split").collect()
            )
            index_files = [
                f for f in os.listdir(os.path.join(tmp, "out", "_index"))
            ] if os.path.isdir(os.path.join(tmp, "out", "_index")) else []
        sha = hashlib.sha256(
            "\n".join("\x1f".join(r) for r in rows).encode()
        ).hexdigest()
        out["curate"] = {
            "survivors": len(rows),
            "stages": res.stage_counts,
            "stage_seconds": res.stage_seconds,
            "cols": sorted(curated.columns),
            "sha256": sha,
            "index_parts": sorted(index_files),
        }
        with open(out_path, "w") as f:
            json.dump(out, f)
        spark.stop()
        return 0
    for name in names:
        df = reg[name](spark, sf_dir)
        rows = sorted([str(v) for v in r] for r in df.collect())
        if mode == "digest":
            import hashlib

            sha = hashlib.sha256(
                "\n".join("\x1f".join(r) for r in rows).encode()
            ).hexdigest()
            out["queries"][name] = {
                "cols": sorted(df.columns), "n": len(rows), "sha256": sha,
            }
        else:
            out["queries"][name] = {"cols": sorted(df.columns), "rows": rows}

    if mode != "digest":
        # one curate cycle end-to-end: staged plan + checkpoints + file sink
        from dshackle_archive_spark.plans.curate_plan import curate
        from dshackle_archive_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir)["documents"]
        with tempfile.TemporaryDirectory() as tmp:
            curated, res = curate(docs, output_path=os.path.join(tmp, "out"))
            survivors = spark.read.parquet(os.path.join(tmp, "out")).count()
        out["curate"] = {"survivors": survivors, "stages": res.stage_counts}

    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
