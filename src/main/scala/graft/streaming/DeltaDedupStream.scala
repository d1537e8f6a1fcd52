package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The incremental near-dup check as a FIRST-CLASS streaming query: an
  * unbounded arrival stream of (doc_id, text) documents is probed, one
  * micro-batch at a time, against a persisted corpus sketch index (the
  * session-pinned shingle/band surface locally; a bucketed table at
  * cluster scale), and confirmed near-dup pairs land in a parquet sink.
  * This is the production shape of `dedup_minhash_incremental_delta`:
  * the one-shot gate query models a single delta; this runs the same
  * core (operators.Dedup.deltaNearDups) under Structured Streaming's
  * checkpointed exactly-once loop, so each crawl drop is deduplicated
  * against the corpus as it arrives.
  *
  * Per-batch cost is O(|batch| sketch + one-sided band join +
  * candidate-scoped verification) — the measured ~2 ms marginal per
  * document (DeltaDedupBench) — and the sink is idempotent per batch:
  * foreachBatch re-runs after a crash REPLACE their own batch_id
  * partition (dynamic partition overwrite, the same exactly-once
  * upgrade as NpmStream's sinks), so replayed batches never duplicate
  * pairs.
  */
object DeltaDedupStream {

  def start(
      spark: SparkSession,
      deltaDocs: DataFrame, // streaming (doc_id, text)
      corpusSh: DataFrame,
      corpusBands: DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    deltaDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Dedup.deltaNearDups(batch, corpusSh, corpusBands)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
      }
      .start()
}
