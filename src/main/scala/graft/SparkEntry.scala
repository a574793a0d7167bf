package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the LLM-data north-star
  * set) is registered in [[queries]]; each SQL-expressible one carries a
  * DuckDB oracle in [[oracleSql]] producing the identical, identically-named,
  * identically-ordered result on the same parquet fixtures.
  */
object SparkEntry {

  /** Flagship query (join→agg→rank-worthy analytics the reference implies:
    * `planning/rough-idea.md:7`) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.flagshipRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_s4_extract_blocks, q_decode_stub) → rows-only check. */
  def oracleSql: Map[String, String] =
    Catalog.all.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
