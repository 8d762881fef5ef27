"""SepSubscription durability test (the replication-position
contract): a named subscription resumes from its checkpoint — stop +
restart delivers nothing twice and nothing is skipped; unsubscribe
drops the cursor and the next start replays from the beginning.
"""

from __future__ import annotations

import tempfile

from hbase_sep_spark.streaming.subscription import SepSubscription
from tests.conftest import SF_UNIT


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_subscription_resumes_from_checkpoint(spark):
    delivered: list[int] = []

    def listener(batch_df, epoch_id):
        delivered.append(batch_df.count())

    sub = SepSubscription(
        spark,
        name="pytest-sub",
        feed_path=f"{SF_UNIT}/events.parquet",
        root=tempfile.mkdtemp(prefix="sep_subs_"),
        batch_size=400,
    )

    # First run: the whole feed arrives in batches.
    _drain(sub.start(listener))
    total_first = sum(delivered)
    assert total_first == 1000  # sf0.001 events rows
    assert len(delivered) >= 2  # actually batched

    # Resume: durable cursor ⇒ nothing is redelivered.
    delivered.clear()
    _drain(sub.start(listener))
    assert sum(delivered) == 0

    # Unsubscribe drops the cursor ⇒ full replay.
    sub.unsubscribe()
    delivered.clear()
    _drain(sub.start(listener))
    assert sum(delivered) == 1000
