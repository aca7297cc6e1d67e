"""Chunking and split assignment compose onto Structured Streaming
unchanged: both are stateless projections (generate+explode / md5 case
expression — no aggregation, no state), so the exact same functions
applied to a readStream DataFrame must produce the batch result. This is
the standard ingest topology: chunk + split-tag documents as they land,
before anything downstream aggregates."""

from __future__ import annotations


def test_chunk_and_split_on_a_stream_match_batch(spark, tmp_path):
    from triangle_counting_spark.functions.sampling import hash_split
    from triangle_counting_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(5 + 13 * i)))
         for i in range(8)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    static = spark.read.parquet(src)

    batch_chunks = {
        (r.doc_id, r.chunk_start): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(static, chunk_tokens=16, overlap=4).collect()
    }
    batch_split = {r.doc_id: r.split
                   for r in hash_split(static, {"a": 0.5, "b": 0.5}).collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    chunked = chunk_documents(stream, chunk_tokens=16, overlap=4)
    tagged = hash_split(stream, {"a": 0.5, "b": 0.5})
    assert chunked.isStreaming and tagged.isStreaming
    for df, name in ((chunked, "chunk_stream"), (tagged, "split_stream")):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got_chunks = {
        (r.doc_id, r.chunk_start): (r.chunk_text, r.n_tokens)
        for r in spark.table("chunk_stream").collect()
    }
    got_split = {r.doc_id: r.split for r in spark.table("split_stream").collect()}
    assert got_chunks == batch_chunks
    assert got_split == batch_split
