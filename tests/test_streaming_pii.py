"""PII scrubbing composes onto Structured Streaming unchanged: pii_scrub
is a stateless projection (regexp chain, no aggregation, no state), so
the exact same function applied to a readStream DataFrame must produce
the batch result — the standard ingest-time scrub topology (scrub BEFORE
anything durable sees the raw text)."""

from __future__ import annotations


def test_pii_scrub_on_a_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from triangle_counting_spark.functions.pii import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail a@b.co please"),
            (1, "from 10.1.2.3 card 4111-1111-1111-1111"),
            (2, "clean row"),
            (3, "ssn 123-45-6789 and x@y.org"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    batch = {r.doc_id: (r.text, r.n_redactions)
             for r in pii_scrub(spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scrubbed = pii_scrub(stream)
    assert scrubbed.isStreaming
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("pii_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: (r.text, r.n_redactions)
           for r in spark.table("pii_stream").collect()}
    assert got == batch
    assert got[1][0] == "from <IPV4> card <CARD>"
