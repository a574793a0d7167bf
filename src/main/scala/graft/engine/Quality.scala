package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.Try

/** Data-quality / audit operators (SURVEY §2.11, Q1–Q3). */
object Quality {

  /** Q1 — schema-presence audit (ref `src/etl/bad_parquet.py:6-36`): for each
    * parquet path, flag it when `requiredCol` is missing.  Footer-only reads —
    * no data pages touched — so auditing a 100 TB lake costs one metadata op
    * per file, parallelizable over the file list if it grows large. */
  def schemaAudit(spark: SparkSession, paths: Seq[String], requiredCol: String): DataFrame = {
    val rows = paths.map { p =>
      val has = Try(spark.read.parquet(p).schema.fieldNames.contains(requiredCol)).getOrElse(false)
      Row(p, requiredCol, if (has) "ok" else "missing")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("path", StringType, false),
        StructField("required_col", StringType, false),
        StructField("status", StringType, false))))
  }

  /** Q3 — missing-column validation (ref `ingest_harvest_data.py:264-265`,
    * `ingest_population_data.py:241,259-261`): warnings, not failures. */
  def validateColumns(df: DataFrame, required: Seq[String]): Either[List[String], DataFrame] = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.isEmpty) Right(df)
    else Left(missing.map(c => s"missing required column: $c").toList)
  }

  /** Q2 — error-tolerant runner (ref `load_duckdb_data.py:42-46`): apply each
    * step, log-and-continue on failure, return successes. */
  def runTolerant[A](steps: Seq[(String, () => A)]): (List[(String, A)], List[(String, Throwable)]) = {
    val results = steps.map { case (name, f) => name -> Try(f()).toEither }
    (results.collect { case (n, Right(a)) => n -> a }.toList,
     results.collect { case (n, Left(e)) => n -> e }.toList)
  }
}
