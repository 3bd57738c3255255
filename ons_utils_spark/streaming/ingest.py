"""Streaming corpus ingest with near-duplicate rejection.

The streaming twin of the incremental dedup path (`operators/dedup.py
minhash_lsh_join` — the batch form is oracle-checked as
``q_dedup_incremental``): documents arrive on a stream; every micro-batch
is deduplicated against the PERSISTED MinHash index of the already-accepted
corpus, survivors are appended to the corpus sink, and their signatures are
appended to the index — so later batches also dedup against earlier
batches without ever re-shingling the corpus.

At 100 TB: per-trigger cost is O(batch) shingling + one band-bucket join
against the stored index (which a real deployment keeps bucketed by
``band_hash`` — `sources/write.py::write_bucketed_table`). The corpus
itself is never re-read. ``foreachBatch`` gives at-least-once semantics on
retry; the plain-parquet appends here are therefore NOT exactly-once under
mid-batch crashes — production sinks should be an ACID table format
(Delta/Iceberg) where the append + index update commit atomically, as the
module-level caveat in `sources/write.py::merge_overwrite` already notes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame as SparkDF, functions as F

from ons_utils_spark.operators.dedup import minhash_index, minhash_lsh_join


def dedup_ingest_batch(
    batch: SparkDF,
    index_path: str,
    out_path: str,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    intra_batch: bool = True,
    update_index: bool = True,
) -> int:
    """Process ONE batch of documents: reject near-dups, append survivors.

    Steps: (1) optional within-batch dedup (keep the smallest id of each
    near-dup pair); (2) LSH join against the stored index; (3) append
    survivors to ``out_path`` and (when ``update_index``) their
    ``minhash_index`` rows to ``index_path``. Returns the survivor count.

    Shared by the streaming ``foreachBatch`` hook and by plain batch
    ingest jobs — the logic is identical, which is the point of
    foreachBatch-style incremental design.
    """
    spark = batch.sparkSession
    batch = batch.select(id_col, text_col)

    if intra_batch:
        from ons_utils_spark.operators.dedup import minhash_lsh_pairs

        self_pairs = minhash_lsh_pairs(
            batch, id_col, text_col, n=n, num_hashes=num_hashes,
            bands=bands, threshold=threshold, seed=seed,
        )
        losers = self_pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        batch = batch.join(losers, id_col, "left_anti")

    index = spark.read.parquet(index_path)
    pairs = minhash_lsh_join(
        batch, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
        seed=seed, right_index=index,
    )
    dup_ids = pairs.select(F.col("id_left").alias(id_col)).distinct()
    survivors = batch.join(dup_ids, id_col, "left_anti")
    # The batch is consumed three times (intra-batch pairs, index join,
    # anti join) — pin it so the stream source isn't re-read per consumer.
    survivors = survivors.localCheckpoint(eager=True)

    survivors.write.mode("append").parquet(out_path)
    if update_index:
        minhash_index(
            survivors, id_col, text_col, n=n, num_hashes=num_hashes, seed=seed
        ).write.mode("append").parquet(index_path)
    return survivors.count()


def dedup_ingest_writer(
    stream_df: SparkDF,
    index_path: str,
    out_path: str,
    checkpoint_dir: Optional[str] = None,
    **kwargs,
):
    """``writeStream`` writer running :func:`dedup_ingest_batch` per trigger.

    Start it with whatever trigger fits the deployment, e.g.::

        q = dedup_ingest_writer(stream, idx, out, checkpoint_dir=ckpt) \\
                .trigger(availableNow=True).start()
        q.awaitTermination()

    The checkpoint directory gives exactly-once BATCH TRACKING (a batch is
    not reprocessed after restart); see the module docstring for the
    sink-side atomicity caveat.
    """

    def process(batch: SparkDF, batch_id: int) -> None:
        dedup_ingest_batch(batch, index_path, out_path, **kwargs)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
