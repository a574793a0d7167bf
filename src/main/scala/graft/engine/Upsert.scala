package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S10 — keyed upsert with column-selective update
  * (ref `sql/load/load_population_production.sql:30-32`):
  * `ON CONFLICT (state,species,year,unit) DO UPDATE SET post_hunt_estimate=…,
  * male_female_ratio=…` — note `herd_name` is NOT updated on conflict.
  *
  * Spark has no ON CONFLICT; the idiomatic rewrite is dedup-then-outer-join:
  * per-side last-wins dedup (deterministic `row_number`), then a full-outer
  * join on the key with per-column precedence:
  *   - `updateCols`:   incoming value wins, fall back to existing;
  *   - `preserveCols`: existing value wins, fall back to incoming (the
  *     reference's keep-old-`herd_name` semantics).
  *
  * Scale: both sides shuffle once on the same key → the join is co-partitioned.
  * At 100 TB the existing side must not be rewritten wholesale: use
  * `upsertPartitioned`, which restricts the rewrite to the partitions present
  * in the incoming batch (dynamic partition overwrite), so a 1-year incremental
  * load touches 1 year of the lake, not all of it.
  */
object Upsert {

  /** Deterministic within-batch last-wins: keep one row per key, preferring
    * the greatest `orderCol` (DuckDB applies conflicting rows sequentially;
    * we pick an explicit total order instead — SURVEY §7.4.1). */
  def dedupLastWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")

  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             updateCols: Seq[String], preserveCols: Seq[String]): DataFrame = {
    val e = existing.select((keys ++ updateCols ++ preserveCols).map(col): _*)
    val i = incoming.select((keys ++ updateCols ++ preserveCols).map(col): _*)
    val joined = e.alias("e").join(i.alias("i"),
      keys.map(k => col(s"e.$k") <=> col(s"i.$k")).reduce(_ && _), "full_outer")
    val keyCols      = keys.map(k => coalesce(col(s"e.$k"), col(s"i.$k")).as(k))
    val updated      = updateCols.map(c => coalesce(col(s"i.$c"), col(s"e.$c")).as(c))
    val preserved    = preserveCols.map(c => coalesce(col(s"e.$c"), col(s"i.$c")).as(c))
    joined.select(keyCols ++ updated ++ preserved: _*)
  }

  /** Scale path: only rewrite lake partitions the incoming batch touches.
    * `partCol` is a partition column of the lake (e.g. `year`). */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession, lakeRoot: String,
                        incoming: DataFrame, keys: Seq[String], updateCols: Seq[String],
                        preserveCols: Seq[String], partCol: String): Unit = {
    val touched = incoming.select(partCol).distinct().collect().map(_.get(0))
    val existing = spark.read.parquet(lakeRoot).filter(col(partCol).isin(touched: _*))
    val merged = upsert(existing, incoming, keys, updateCols, preserveCols)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    merged.write.mode("overwrite").partitionBy(partCol).parquet(lakeRoot)
  }
}
