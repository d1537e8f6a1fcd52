package graft.npm

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import model.CatalogRecord

/** "Latest version per package" catalog compaction as a typed
  * `Aggregator` (the §2.10 exercise SURVEY names): max-by change_seq_id
  * with a catalog-record buffer. `latest-wins` compaction is what turns
  * the append-only change log into the current-state mirror table.
  *
  * The buffer is a single record → constant-size state, map-side
  * combinable; at 100 TB the same aggregation runs as partial max-by per
  * partition, one shuffle on package_name.
  */
object LatestPerPackage extends Aggregator[CatalogRecord, Option[CatalogRecord], CatalogRecord] {

  override def zero: Option[CatalogRecord] = None

  override def reduce(b: Option[CatalogRecord], a: CatalogRecord): Option[CatalogRecord] =
    Some(b.fold(a)(best => if (a.change_seq_id > best.change_seq_id) a else best))

  override def merge(l: Option[CatalogRecord], r: Option[CatalogRecord]): Option[CatalogRecord] =
    (l, r) match {
      case (Some(a), Some(b)) => Some(if (a.change_seq_id > b.change_seq_id) a else b)
      case _ => l.orElse(r)
    }

  override def finish(reduction: Option[CatalogRecord]): CatalogRecord =
    reduction.getOrElse(throw new IllegalStateException("empty group"))

  // kryo for the buffer: top-level Option has no product encoder; the
  // buffer never hits storage, only shuffle
  override def bufferEncoder: Encoder[Option[CatalogRecord]] =
    Encoders.kryo[Option[CatalogRecord]]

  override def outputEncoder: Encoder[CatalogRecord] = Encoders.product[CatalogRecord]

  /** Compaction entry point: one current-state row per package. */
  def compact(catalog: Dataset[CatalogRecord])(implicit spark: SparkSession): Dataset[CatalogRecord] = {
    implicit val enc: Encoder[CatalogRecord] = Encoders.product[CatalogRecord]
    catalog.groupByKey(_.package_name)(Encoders.STRING)
      .agg(LatestPerPackage.toColumn.name("latest"))
      .map(_._2)
  }
}
