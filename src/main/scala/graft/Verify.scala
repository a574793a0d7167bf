package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [nameRegex] — the optional regex restricts the dump
    // to matching query names for fast local pre-flight; the driver's
    // two-arg call dumps everything.
    val (sfDir, outDir) = (args(0), args(1))
    val nameFilter: String => Boolean =
      if (args.length > 2) { val re = args(2).r; n => re.findFirstIn(n).isDefined }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture-drift tripwire: force analysis of every base frame FIRST, so
    // a driver fixture regeneration with a changed schema fails ONCE,
    // loudly, naming the table — not as dozens of opaque query failures
    // (the round-8 events ts-type drift cost 28 rows silently).
    locally {
      import graft.queries.Fixtures
      val bases: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
        Seq("region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "documents", "embeddings")
          .map(n => n -> (() => Fixtures.table(spark, sfDir, n))) ++
        Seq("events" -> (() => Fixtures.events(spark, sfDir)),
            "stage" -> (() => Fixtures.stage(spark, sfDir)),
            "harvest" -> (() => Fixtures.harvest(spark, sfDir)))
      bases.foreach { case (n, f) =>
        try f().queryExecution.analyzed
        catch { case scala.util.control.NonFatal(e) => System.err.println(
          s"[verify] FIXTURE DRIFT: base frame '$n' fails analysis — " +
            s"check $sfDir/$n schema vs Fixtures.scala: ${e.getMessage}")
        }
      }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (nameFilter(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case scala.util.control.NonFatal(e) =>
          // NonFatal: a per-query failure records and continues; a fatal VM
          // error (OOM, thread death) must abort the sweep — results from a
          // corrupt JVM would be worse than no results
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
