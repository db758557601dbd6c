#!/usr/bin/env python
"""Live-follow tour: gRPC-shaped transport, push head subscription,
broker notifications, and a Prometheus endpoint — on in-process stubs.

Run:  python examples/live_follow.py   (~30 s on local[8])

This is the streaming deployment shape: a dshackle proxy feeds heads over
a server-streaming subscription (reconnecting across drops), each
micro-batch archives new heights, notifications transit a broker socket,
and /metrics serves live counters for the lifetime of the run.
"""

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import dshackle_archive_spark as das
from dshackle_archive_spark.core import DataKind
from dshackle_archive_spark.operators.metrics import MetricsRegistry, start_metrics_server
from dshackle_archive_spark.sources.dshackle import DshackleClient
from dshackle_archive_spark.sources.fetcher import FetchPolicy
from dshackle_archive_spark.sources.notify import send_notifications
from dshackle_archive_spark.sources.rpc import EthereumRpcProvider
from dshackle_archive_spark.streaming.head_source import HeadStream
from dshackle_archive_spark.streaming.stream_plan import run_stream

from stub_broker import start_broker
from stub_dshackle import start_dshackle_stub
from stub_rpc import EthChainModel

spark = das.get_spark("live-follow", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

# a dshackle-shaped node that drops the subscription every few messages
model = EthChainModel(head=5_000)
url, node = start_dshackle_stub(model, drop_subscription_after=4)
client = DshackleClient(url, chain="ETH")
provider = EthereumRpcProvider(url, client=client)

# Prometheus endpoint + broker topic
registry = MetricsRegistry()
metrics_srv = start_metrics_server(registry, "127.0.0.1", 0)
mport = metrics_srv.server_address[1]
bhost, bport, broker = start_broker()

with tempfile.TemporaryDirectory() as root:
    # follow the head via the reconnecting push subscription; advance the
    # chain in the background while the stream runs
    import threading

    def advance():
        for _ in range(6):
            time.sleep(0.4)
            model.head += 1

    threading.Thread(target=advance, daemon=True).start()
    st = run_stream(
        spark, provider, root,
        tables=(DataKind.BLOCKS,),
        policy=FetchPolicy(parallel=8, attempts=3, backoff_base_s=0.05),
        num_batches=3, engine="loop", poll_interval_s=1.0,
        head_source=HeadStream(client.subscribe_head, backoff_base_s=0.05),
        metrics_registry=registry,
    )
    print(f"[stream] archived heights {st.archived_heights[:3]}..."
          f"{st.archived_heights[-1]} ({len(st.archived_heights)} total, "
          "contiguous across dropped subscriptions)")

    # notifications → broker socket (one producer connection per partition)
    from pyspark.sql import functions as F

    res = das.archive(spark, provider, root, das.Range(1_000, 1_099),
                      tables=(DataKind.BLOCKS,), chunk=50,
                      policy=FetchPolicy(parallel=8))
    wr = res.notifications.withColumn("skipped", F.lit(False)).withColumn(
        "n_rows", F.lit(0))
    send_notifications(wr, "socket", host=bhost, port=bport)
    time.sleep(0.5)
    print(f"[notify] broker consumed {len(broker.messages)} messages; first:")
    print("  ", json.dumps(json.loads(broker.messages[0]))[:100], "...")
    registry.record_write_results(res.write_rows)

# scrape the live endpoint
body = urllib.request.urlopen(f"http://127.0.0.1:{mport}/metrics").read().decode()
print("[metrics] /metrics serves:",
      [l for l in body.splitlines() if "items_total" in l and not l.startswith("#")])

node.shutdown()
broker.shutdown()
metrics_srv.shutdown()
spark.stop()
print("done.")
