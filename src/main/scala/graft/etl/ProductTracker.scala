package graft.etl

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product sold-count timeseries (`batch/product_tracker.py`): an
  * append-only (product_id, scraped_at, sold_count, sold_delta, seller_id,
  * username) table (`:112-119`), each scrape's delta computed against the
  * last known count, plus a latest-per-product serving view (`:287-294`).
  *
  * Scale note: the reference loads the entire history's latest counts into
  * a driver dict (`_load_last_sold_counts` collects). Here the same
  * semantics are a latest-per-key aggregation joined on product_id — one
  * shuffle keyed exactly like the table, no driver materialization, works
  * at any history size.
  */
object ProductTracker {

  /** Delta for one new scrape batch against the existing history
    * (`product_tracker.py:425-450`): sold_delta = sold_count − last known,
    * 0 when the product was never seen (first run → empty history).
    */
  def withSoldDelta(scrape: DataFrame, history: Option[DataFrame],
      orderCols: Seq[Column] = Seq(col("scraped_at").desc)): DataFrame =
    history match {
      case Some(h) =>
        val last = Dedup.latestPerKey(h, Seq("product_id"), orderCols)
          .select(col("product_id"), col("sold_count").as("last_sold"))
        scrape.join(last, Seq("product_id"), "left")
          .withColumn("sold_delta",
            when(col("last_sold").isNotNull, col("sold_count") - col("last_sold"))
              .otherwise(lit(0L)))
          .drop("last_sold")
      case None => scrape.withColumn("sold_delta", lit(0L))
    }

  /** Batch replay of the whole incremental loop: per-product `lag` over
    * the scrape order — running [[withSoldDelta]] scrape-by-scrape over
    * the same records yields exactly these deltas (spec-pinned).
    */
  def rebuildDeltas(scrapes: DataFrame,
      orderCols: Seq[Column] = Seq(col("scraped_at"))): DataFrame = {
    val w = Window.partitionBy("product_id").orderBy(orderCols: _*)
    scrapes.withColumn("sold_delta",
      coalesce(col("sold_count") - lag("sold_count", 1).over(w), lit(0L)))
  }

  /** Latest-per-product serving view (`product_tracker.py:287-294`). */
  def latestSoldView(timeseries: DataFrame,
      orderCols: Seq[Column] = Seq(col("scraped_at").desc)): DataFrame =
    Dedup.latestPerKey(timeseries, Seq("product_id"), orderCols)
}
