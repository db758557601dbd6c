#!/usr/bin/env python
"""End-to-end tour of dshackle-archive-spark on the mock chain.

Run:  python examples/quickstart.py   (finishes in ~1 minute on local[8])
"""

import sys
import os
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dshackle_archive_spark as das
from dshackle_archive_spark.core import DataKind
from dshackle_archive_spark.sources.archive import delete_files, list_archive_files, register_archive_views
from dshackle_archive_spark.sources.fetcher import FetchPolicy
from dshackle_archive_spark.sources.mock_chain import MockChain

spark = das.get_spark("quickstart", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
chain = MockChain(head_height=1_000_000)
policy = FetchPolicy(parallel=8)
BT = (DataKind.BLOCKS, DataKind.TRANSACTIONS)

with tempfile.TemporaryDirectory() as root:
    # 1. archive a historical range into reference-layout files
    res = das.archive(spark, chain, root, das.Range(1000, 1999), tables=BT,
                      chunk=500, policy=policy)
    print(f"[archive] wrote {res.written} files:")
    for f in list_archive_files(os.path.join(root, "eth")):
        print("   ", f)

    # 2. verify integrity (chain linkage, tx sets, completeness)
    rep = das.verify(spark, chain, root, das.Range(1000, 1999), tables=BT)
    print(f"[verify] groups={rep.groups_total} ok={rep.groups_ok} failures={rep.failures}")

    # 3. break it, then fix
    delete_files(os.path.join(root, "eth"),
                 ["000000000/range-000001500_000001999.txes.parquet"])
    fx = das.fix(spark, chain, root, das.Range(1000, 1999), tables=BT,
                 chunk=500, policy=policy)
    print(f"[fix] detected + repaired: {fx.missing}")

    # 4. follow the chain tip for a few micro-batches
    st = das.run_stream(spark, chain, root, tables=BT, policy=policy, num_batches=2)
    print(f"[stream] archived heights {st.archived_heights[:5]}...")

    # 5. compact the streamed singles into range files
    cp = das.compact(spark, root, "ETH",
                     das.Range(st.archived_heights[0] // 500 * 500,
                               st.archived_heights[0] // 500 * 500 + 499),
                     tables=BT, chunk=500)
    print(f"[compact] chunks={cp.compacted_chunks} skipped={len(cp.skipped_chunks)}")

    # 6. transactional variant: compact commits as ONE manifest swap;
    #    consumed singles stay on disk for pinned readers until vacuum
    from dshackle_archive_spark.sources import snapshots as snap

    lo = (st.archived_heights[0] // 500 + 1) * 500
    cp2 = das.compact(spark, root, "ETH", das.Range(lo, lo + 499),
                      tables=BT, chunk=500, snapshot=True)
    base = os.path.join(root, "eth")
    cur = snap.load_snapshot(base)
    if cur is not None:
        print(f"[snapshot] v{cur.version}: {len(cur.files)} files; "
              f"vacuum(dry) would remove "
              f"{len(snap.vacuum(base, keep_last=1, dry_run=True))}")

spark.stop()
print("done")
