package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Kafka sink builders for the reference's topic layout (K1-K3). Pure
  * plan builders — the kafka connector jar isn't present in this
  * environment, so these compile against the generic writer API and are
  * exercised operationally on a real cluster; the parquet fan-out in
  * NpmStream.start is the tested local stand-in.
  */
object Sinks {

  /** K1 — main change topic: key = seq (the reference's choice,
    * producer.ts:180 — note SURVEY §7.4.1 on what that does to
    * per-package ordering), gzip compression (producer.ts:178), 10 MB
    * guard upstream (F8).
    */
  def kafkaChanges(df: DataFrame, servers: String, topic: String = "npm-changes"): DataStreamWriter[Row] =
    df.selectExpr("CAST(seq AS STRING) AS key", "value")
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("kafka.compression.type", "gzip")

  /** K2 — unified audit topic: one record per (seq, stage) event; the
    * reference's five per-stage topics become a `stage` column
    * (SURVEY §2.2 K2 mapping).
    */
  def kafkaAudit(audit: DataFrame, servers: String, topic: String = "pipeline_events"): DataStreamWriter[Row] =
    audit
      .select(col("seq").cast("string").as("key"),
        to_json(struct(col("seq"), col("stage"))).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)

  /** K3 — dead-letter topic with the widened schema
    * {seq, package, reason, stage} (FIXTURES.md F2).
    */
  def kafkaDlq(skipped: DataFrame, servers: String, topic: String = "skipped_changes"): DataStreamWriter[Row] =
    skipped
      .select(coalesce(col("seq").cast("string"), lit("unknown")).as("key"),
        to_json(struct(col("seq"), col("package_name"), col("reason"), col("stage"))).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
}
