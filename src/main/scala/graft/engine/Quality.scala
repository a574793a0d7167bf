package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration
import scala.util.Try

/** Data-quality / audit operators (SURVEY §2.11, Q1–Q3). */
object Quality {

  private val auditSchema = StructType(Seq(
    StructField("path", StringType, false),
    StructField("required_col", StringType, false),
    StructField("status", StringType, false)))

  /** Q1 — schema-presence audit (ref `src/etl/bad_parquet.py:6-36`): for each
    * parquet path, flag it when `requiredCol` is missing.  The path list is
    * DISTRIBUTED over executors and each task reads only the parquet FOOTER
    * (`ParquetFileReader.readFooter`, no data pages) — a 100 TB lake with
    * 10⁶ files audits as one metadata op per file across the cluster instead
    * of a sequential driver loop.  A directory path descends (recursively,
    * so Hive-partitioned `root/k=v/part.parquet` layouts work) to its first
    * part-file — all parts of one write share a schema.  Unreadable paths
    * report `missing`.  CAVEAT (inherent to footer-only reads): Hive-style
    * PARTITION columns live in directory names, not footers — auditing for
    * a partition column reports `missing`; use the catalog/`spark.read`
    * schema for those. */
  def schemaAudit(spark: SparkSession, paths: Seq[String], requiredCol: String): DataFrame = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(paths, slices).map { p =>
      def firstParquet(fs: org.apache.hadoop.fs.FileSystem, path: Path): Option[Path] = {
        val st = fs.getFileStatus(path)
        if (!st.isDirectory) Some(path)
        else fs.listStatus(path).sortBy(_.getPath.getName).iterator.flatMap { c =>
          if (c.isDirectory) firstParquet(fs, c.getPath)
          else if (c.getPath.getName.endsWith(".parquet")) Iterator.single(c.getPath)
          else Iterator.empty
        }.nextOption()
      }
      val has = Try {
        val path = new Path(p)
        val fs = path.getFileSystem(conf.value)
        val file = firstParquet(fs, path).getOrElse(
          throw new java.io.FileNotFoundException(p))
        ParquetFileReader.readFooter(conf.value, file, ParquetMetadataConverter.NO_FILTER)
          .getFileMetaData.getSchema.containsField(requiredCol)
      }.getOrElse(false)
      Row(p, requiredCol, if (has) "ok" else "missing")
    }
    spark.createDataFrame(rows, auditSchema)
  }

  /** Column profile — per-column row/present/distinct counts in ONE pass
    * over the data (all aggregates in a single `agg`, then `stack` unpivots
    * the 1-row result).  The profiling query every ingest runs before
    * trusting a new feed; one-pass matters at 100 TB where per-column
    * passes would multiply the scan cost. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "profile: need at least one column (stack(0, ...) is invalid SQL)")
    // Generated SQL interpolates raw column names — quote every identifier
    // (backticks, with backticks doubled) and escape the label literal, so
    // names with spaces/dots/quotes survive parsing and alias resolution.
    def bq(name: String): String = "`" + name.replace("`", "``") + "`"
    def sq(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val aggs = cols.flatMap(c => Seq(
      count(col(bq(c))).as(s"__cnt_$c"),          // backtick-quoted: a bare
      countDistinct(col(bq(c))).as(s"__ndv_$c"))) :+ // col(c) parses dots as fields
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"${sq(c)}, __n, ${bq(s"__cnt_$c")}, ${bq(s"__ndv_$c")}").mkString(", ") +
        ") as (col_name, n_rows, n_present, n_distinct)"))
  }

  /** Robust per-group outlier stats via median/MAD (median absolute
    * deviation) — the quality gate that survives the heavy-tailed length
    * distributions real corpora have, where mean/stddev gates are dragged
    * by the very outliers they're meant to catch.  A row is an outlier when
    * `|x − median| > k·MAD` (k≈3 ≙ z≈2 under normality).
    *
    * Two exact-percentile passes over the data (median, then MAD — MAD
    * needs the median first; that sequencing is inherent to the exact
    * statistic), each a hash aggregation on the group key; the per-group
    * medians are a |groups|-row frame broadcast back, so no data-sized
    * shuffle beyond the two aggs.  At 100 TB swap `percentile` for
    * `percentile_approx` to collapse to sketch aggregations — same shape,
    * one fewer decimal of precision. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.functions._
    val v = col(valueCol).cast("double")
    // __-prefixed internals: a caller's own "med"/"mad" column must not
    // collide with the intermediates (AMBIGUOUS_REFERENCE on the join)
    val med = df.groupBy(groupCol).agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(groupCol)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(min("__med").as("med"), min("__mad").as("mad"), // constant per group
        count(lit(1)).as("n"),
        sum(when(abs(v - col("__med")) > lit(k) * col("__mad"), 1L).otherwise(0L))
          .cast("long").as("n_outliers"))
  }

  /** Winsorization — clip each value to its GROUP's [lo, hi] exact
    * quantiles: the standard outlier treatment when rows must be kept (a
    * MAD gate drops them; winsorizing caps them), e.g. before computing
    * means that a single fat-finger value would drag.  Same scale shape as
    * [[robustOutliers]]: one exact-percentile aggregation on the group key,
    * per-group bounds broadcast back, then a per-row element-wise clip —
    * no second data-sized shuffle.  Exact `percentile` ≡ DuckDB
    * `quantile_cont`; swap for `percentile_approx` at corpus scale. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    require(lo >= 0 && hi <= 1 && lo < hi, s"winsorize: need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val v = col(valueCol).cast("double")
    val bounds = df.groupBy(groupCol).agg(
      percentile(v, lit(lo)).as("__lo"), percentile(v, lit(hi)).as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        when(v < col("__lo"), col("__lo"))
          .when(v > col("__hi"), col("__hi")).otherwise(v))
      .drop("__lo", "__hi")
  }

  /** Per-group z-score standardization from EXACT moments: one aggregation
    * collects (n, Σx, Σx²) with decimal accumulation (the q_corr_moments
    * discipline — double co-moment accumulation is partition-order
    * dependent), the per-group (mean, std) frame broadcasts back, and the
    * score is element-wise.  Population variance via `Σx²/n − mean²`,
    * floored at 0 (cancellation can dip epsilon-negative — deterministically
    * so, but sqrt would NaN); zero-variance groups score 0, not NaN/∞.
    * The feature-scaling primitive; same shape at any corpus size: one
    * shuffle on the group key plus a broadcast join. */
  def zscore(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val v = col(valueCol).cast(DoubleType)
    val m = df.groupBy(groupCol).agg(
      count(valueCol).as("__n"),
      sum(v.cast(DecimalType(38, 6))).cast(DoubleType).as("__s"),
      sum((v * v).cast(DecimalType(38, 6))).cast(DoubleType).as("__ss"))
    val mean = col("__s") / col("__n")
    val variance = greatest(col("__ss") / col("__n") - mean * mean, lit(0.0))
    val std = sqrt(variance)
    df.join(broadcast(m), Seq(groupCol))
      .withColumn(s"${valueCol}_z",
        when(std > 0, (v - mean) / std).otherwise(lit(0.0)))
      .drop("__n", "__s", "__ss")
  }

  /** Population Stability Index between two corpus slices over a shared
    * bucketing — the standard drift monitor for a pipeline that re-ingests
    * continuously: PSI = Σᵢ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over histogram buckets,
    * add-1-smoothed so buckets present in only one slice stay finite.
    * Every term is ≥ 0 (x·ln of the same ratio), so per-bucket terms
    * localize WHERE the distribution moved as well as how much.  Rule of
    * thumb: Σ < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Returns per-bucket rows `(bucket, n_a, n_b, p_a, p_b, psi_term)`;
    * the headline PSI is the consumer's decimal-exact sum of the
    * 9-dp-rounded terms (sums, not pre-divided scalars — the cross-engine
    * discipline used by every scoring op here).
    *
    * Scale shape: ONE groupBy on the bucket id with conditional partial
    * aggregates (map-side combine), totals crossed back in as a broadcast
    * 1-row frame.  Bucket cardinality is the histogram width — bounded by
    * construction, never by the data. */
  def psiDrift(df: DataFrame, bucketCol: org.apache.spark.sql.Column,
               inA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val b = df.select(bucketCol.as("bucket"), inA.as("__a"))
    val counts = b.groupBy("bucket").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    psiFromCounts(counts.select("bucket", "n_a"),
      counts.select("bucket", "n_b"))
  }

  /** [[psiDrift]] from PRE-AGGREGATED histograms `(bucket, n_a)` /
    * `(bucket, n_b)` — the form a streaming monitor needs, where the
    * current distribution arrives as exactly-once-committed per-batch
    * histogram shards and the reference was frozen long ago.  Buckets
    * missing on one side full-outer-join in as zero (then add-1 smoothing
    * keeps them finite); bucket universe = the union, so a NOVEL bucket
    * appearing in production registers as drift instead of vanishing. */
  def psiFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val j = a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = j.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"),
      count(lit(1)).as("__k"))
    j.crossJoin(broadcast(totals))
      .withColumn("p_a", (col("n_a") + 1) / (col("__ta") + col("__k")))
      .withColumn("p_b", (col("n_b") + 1) / (col("__tb") + col("__k")))
      .withColumn("psi_term",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 9))
      .select("bucket", "n_a", "n_b", "p_a", "p_b", "psi_term")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of the `inA` and !`inA` halves — the binless
    * complement to [[psiDrift]]: PSI sees WHERE mass moved between chosen
    * buckets, KS is the sup-norm ECDF gap D = max |F_a(v) − F_b(v)|,
    * sensitive to any location/shape shift with zero binning decisions.
    * Returns ONE row `(n_a, n_b, ks, at_v)` — the distance and the value
    * where the gap peaks (ties broken toward the smallest value).
    *
    * Exact D needs the pooled ECDF, i.e. a global cumulative sum — done
    * guardrail-clean with the two-stage-offset shape ([[Relational
    * .withGlobalRowOffsets]] generalized to WEIGHTED prefixes): values
    * page by sign-aware octave (⌊log₂|v|⌋ — a prefix of the value order,
    * ≤ one page per double exponent and sign, so ≤ ~4200 pages for ANY
    * finite input), per-page count totals collect driver-side (metadata,
    * never data), and each page's interior cumulates under a PARTITIONED
    * window.  Determinism: D terms are two BIGINT/BIGINT IEEE divisions
    * and a subtraction; the peak row is totally ordered by (d desc, v). */
  def ksDrift(df: DataFrame, valueCol: org.apache.spark.sql.Column,
              inA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val counts = df.select(valueCol.cast("double").as("v"), inA.as("__a"))
      .groupBy("v").agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("cb"))
    val oct = (floor(log2(abs(col("v")))) + lit(1075L)).cast(LongType)
    val page = when(col("v") === 0d, 0L)
      .when(col("v") > 0d, oct).otherwise(-oct)
    val paged = counts.withColumn("__page", page)
    val pageTotals = paged.groupBy("__page")
      .agg(sum("ca").cast(LongType).as("ta"), sum("cb").cast(LongType).as("tb"))
      .orderBy("__page").collect()
    var accA = 0L; var accB = 0L
    val offRows = pageTotals.map { r =>
      val (oa, ob) = (accA, accB)
      accA += r.getLong(1); accB += r.getLong(2)
      Row(r.getLong(0), oa, ob)
    }.toIndexedSeq
    val (na, nb) = (accA, accB)
    require(na > 0 && nb > 0, "ksDrift: both samples must be non-empty")
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pg", LongType, false),
        StructField("__offa", LongType, false),
        StructField("__offb", LongType, false))))
    val w = Window.partitionBy("__page").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    paged.join(broadcast(offsets), col("__page") === col("__pg"))
      .withColumn("__cuma", col("__offa") + sum("ca").over(w))
      .withColumn("__cumb", col("__offb") + sum("cb").over(w))
      .withColumn("d", abs(col("__cuma") / lit(na) - col("__cumb") / lit(nb)))
      .orderBy(desc("d"), col("v"))
      .limit(1)
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        col("d").as("ks"), col("v").as("at_v"))
  }

  /** Pearson chi-squared test of homogeneity between the `catCol`
    * distributions of the `inA` and !`inA` halves — the CATEGORICAL
    * member of the drift trio ([[psiDrift]] scores binned mass movement,
    * [[ksDrift]] the continuous ECDF gap; chi² asks whether two slices
    * draw category labels from one distribution).  Per category k with
    * row total r=n_a+n_b and grand totals (ta, tb, n): expected counts
    * e_a = r·ta/n, e_b = r·tb/n, and the category's contribution is
    * (n_a−e_a)²/e_a + (n_b−e_b)²/e_b.  Returns one row per category
    * `(cat, n_a, n_b, e_a, e_b, chi2_term)` ordered by cat; the headline
    * statistic is the consumer's decimal-exact sum of the 9-dp-rounded
    * terms against dof = k−1 (sums of rounded terms, not pre-divided
    * scalars — the cross-engine discipline used by every scoring op
    * here).  Large per-category terms localize WHICH label drifted.
    *
    * Scale shape: ONE groupBy on the category with conditional partial
    * aggregates (map-side combine); the two grand totals collect as
    * literals — bounded by label cardinality, never by the data.
    * An EMPTY slice throws (the [[ksDrift]] discipline) instead of
    * producing silent NaN terms through zero expected counts — which means
    * CONSTRUCTION IS AN ACTION: the grand-total collect runs a Spark job
    * when the frame is BUILT, so plan-only consumers (explain, a census
    * sweep, lazy composition) trigger execution here and an empty slice
    * throws at build time, not first collect.
    * Determinism:
    * every term is IEEE arithmetic on exact BIGINTs, identical in both
    * engines; rounding is HALF_UP at 9 dp on both sides. */
  def chi2Drift(df: DataFrame, catCol: org.apache.spark.sql.Column,
                inA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.select(catCol.as("cat"), inA.as("__a"))
      .groupBy("cat").agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    // totals collect (two scalars) so an empty slice refuses loudly — the
    // ksDrift discipline — instead of feeding e_a = 0 denominators into
    // silent NaN terms; the literals then replace the broadcast total
    // frame (one crossJoin fewer, same values, same IEEE sequence)
    val tRow = counts.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
      .collect().head
    require(!tRow.isNullAt(0) && tRow.getLong(0) > 0 &&
        !tRow.isNullAt(1) && tRow.getLong(1) > 0,
      "chi2Drift: both slices must be non-empty")
    counts
      .withColumn("__ta", lit(tRow.getLong(0)))
      .withColumn("__tb", lit(tRow.getLong(1)))
      .withColumn("__n", col("__ta") + col("__tb"))
      // r·ta in DOUBLE, not BIGINT: exact up to 2⁵³ and can never overflow
      // at lake scale (BIGINT·BIGINT would past ~3e9 rows a side)
      .withColumn("e_a",
        (col("n_a") + col("n_b")).cast("double") * col("__ta") / col("__n"))
      .withColumn("e_b",
        (col("n_a") + col("n_b")).cast("double") * col("__tb") / col("__n"))
      .withColumn("chi2_term", round(
        (col("n_a") - col("e_a")) * (col("n_a") - col("e_a")) / col("e_a") +
          (col("n_b") - col("e_b")) * (col("n_b") - col("e_b")) / col("e_b"), 9))
      .select("cat", "n_a", "n_b", "e_a", "e_b", "chi2_term")
      .orderBy("cat")
  }

  /** Benford first-significant-digit audit of a positive numeric column —
    * the forensic data-quality screen for amounts/counts that SHOULD span
    * magnitudes: naturally-occurring multiplicative data leads with digit
    * d at p(d) = log₁₀(1+1/d) (~30% ones), while fabricated, truncated,
    * or unit-capped values flatten the curve.  Returns exactly nine rows
    * `(digit, n, expected_p, chi2_term)` — observed count, Benford mass,
    * and the goodness-of-fit contribution (n − N·p)²/(N·p) — with absent
    * digits present at n=0 (a missing leading digit is itself the
    * strongest possible signal, so the digit spine is unconditional).
    *
    * Semantics: rows with value < 1 are excluded (their leading digit
    * lives in fractional precision, a different regime), and so are rows
    * at or above 2⁶³ (~9.22e18) — the exact floor→BIGINT extraction's
    * domain boundary, where the long cast would saturate and silently
    * misclassify every such value as digit 9; amounts/counts live far
    * inside the domain, and excluding the boundary beats lying about it.
    * Within the domain the digit is the
    * first character of the integer part, extracted through exact
    * floor→BIGINT→string steps rather than log₁₀ so a value like 1000
    * can never misclassify by one ulp of a libm log.  expected_p is
    * 9-dp-rounded BEFORE the term so both engines compute the term from
    * the identical double (Math.log10 and libm log10 agree only to 1
    * ulp).  Scale shape: one projection, one 9-ary groupBy with map-side
    * combine, a broadcast digit spine and 1-row total. */
  def benford(df: DataFrame, valueCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val digits = (1 to 9).map(_.toLong).toDF("digit")
    val obs = df.select(valueCol.cast("double").as("v"))
      .filter(col("v") >= 1d && col("v") < lit(9.223372036854776e18))
      .select(substring(floor(col("v")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = obs.agg(sum("n").as("__t"))
    digits.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .withColumn("expected_p", round(log10(lit(1d) + lit(1d) / col("digit")), 9))
      .withColumn("chi2_term", round(
        (col("n") - col("__t") * col("expected_p")) *
          (col("n") - col("__t") * col("expected_p")) /
          (col("__t") * col("expected_p")), 9))
      .select("digit", "n", "expected_p", "chi2_term")
      .orderBy("digit")
  }

  /** Jensen–Shannon divergence between the same two smoothed histograms
    * [[psiFromCounts]] compares — the BOUNDED drift metric of the family:
    * JSD = ½Σ[pᵢlog₂(pᵢ/mᵢ) + qᵢlog₂(qᵢ/mᵢ)] with m = (p+q)/2, always in
    * [0, 1] (bits), symmetric, and finite even without smoothing — so
    * thresholds transfer across features of different bucket counts,
    * which raw PSI's unbounded scale does not.  Same add-1 smoothing and
    * per-bucket-term output shape `(bucket, n_a, n_b, p_a, p_b,
    * jsd_term)` as PSI; the headline JSD is the consumer's decimal-exact
    * sum of the 9-dp-rounded terms.  Same one-groupBy scale shape. */
  def jsdFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val j = a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = j.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"),
      count(lit(1)).as("__k"))
    val m = (col("p_a") + col("p_b")) / 2
    j.crossJoin(broadcast(totals))
      .withColumn("p_a", (col("n_a") + 1) / (col("__ta") + col("__k")))
      .withColumn("p_b", (col("n_b") + 1) / (col("__tb") + col("__k")))
      .withColumn("jsd_term", round(
        (col("p_a") * log2(col("p_a") / m) + col("p_b") * log2(col("p_b") / m))
          / 2, 9))
      .select("bucket", "n_a", "n_b", "p_a", "p_b", "jsd_term")
  }

  /** [[jsdFromCounts]] on raw rows: bucket and split in one pass (the
    * batch twin, mirroring [[psiDrift]] over [[psiFromCounts]]). */
  def jsdDrift(df: DataFrame, bucketCol: org.apache.spark.sql.Column,
               inA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.select(bucketCol.as("bucket"), inA.as("__a"))
      .groupBy("bucket").agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    jsdFromCounts(counts.select("bucket", "n_a"),
      counts.select("bucket", "n_b"))
  }

  /** Expectation suite — declarative data-quality rules evaluated in ONE
    * pass (the Deequ/dbt-test shape): each rule is a (name, boolean
    * predicate Column); the result is one row per rule with total / pass /
    * violation counts.  All rules compile into a single `agg`, so N rules
    * cost one scan — at 100 TB a per-rule pass would multiply the scan N×.
    * NULL predicate results count as violations (a rule that cannot
    * evaluate did not pass — the conservative read for gate decisions). */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(rules.nonEmpty, "expectations: need at least one rule")
    val aggs = rules.zipWithIndex.flatMap { case ((_, pred), i) =>
      Seq(sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__p_$i"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate to (rule, n_rows, n_pass, n_violations);
    // label literals escaped, so rule names are free-form text
    def sq(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    row.select(expr(
      s"stack(${rules.size}, " +
        rules.zipWithIndex.map { case ((name, _), i) =>
          s"${sq(name)}, __n, __p_$i" }.mkString(", ") +
        ") as (rule, n_rows, n_pass)"))
      .withColumn("n_violations", col("n_rows") - col("n_pass"))
  }

  /** [[expectations]] with WILSON SCORE bounds on each rule's pass rate —
    * the statistically honest release gate: a raw pass rate of 99.5% means
    * something different on 200 rows than on 2 billion, and a gate that
    * compares p̂ against a threshold treats them the same.  The Wilson
    * interval (Wilson 1927; the recommended small-/skewed-sample binomial
    * interval) is
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)`;
    * gate on `wilson_lo ≥ threshold` and the decision carries its own
    * sample-size skepticism.  Adds `(pass_rate, wilson_lo, wilson_hi)` to
    * the expectations row, all 9-dp-rounded; every operation is fixed-order
    * IEEE on the two counts (sqrt is exact cross-engine; z enters as a
    * literal), so the oracle mirrors bit for bit.  Same ONE-scan cost as
    * expectations; defined for n ≥ 1. */
  def expectationsWilson(df: DataFrame,
                         rules: Seq[(String, org.apache.spark.sql.Column)],
                         z: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = expectations(df, rules)
    withWilson(base.withColumn("pass_rate",
      round(col("n_pass") / col("n_rows"), 9)), "n_pass", "n_rows", z)
  }

  /** The Wilson interval over an ARBITRARY (successes, trials) column pair —
    * [[expectationsWilson]]'s bounds factored out so ANY binomial audit
    * frame (a recall measurement's `(n_hit, n_truth)`, a gate's
    * `(n_pass, n_rows)`) can carry its own sample-size skepticism: a 0.68
    * recall estimated from 30 mutual pairs has a lower bound near 0.50 and
    * must be gated as such, not as 0.68.  Appends `(wilson_lo, wilson_hi)`,
    * 9-dp-rounded; same fixed-order IEEE arithmetic on the two counts as
    * [[expectationsWilson]], so DuckDB oracles mirror bit for bit.
    * Defined for trials ≥ 1. */
  def withWilson(df: DataFrame, hitCol: String, nCol: String,
                 z: Double = 1.96): DataFrame = {
    import org.apache.spark.sql.functions._
    val n = col(nCol).cast("double")
    val p = col(hitCol) / col(nCol)
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (n * 2)
    val rad = lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (n * n * 4))
    df.withColumn("wilson_lo", round((center - rad) / denom, 9))
      .withColumn("wilson_hi", round((center + rad) / denom, 9))
  }

  /** Q3 — missing-column validation (ref `ingest_harvest_data.py:264-265`,
    * `ingest_population_data.py:241,259-261`): warnings, not failures. */
  def validateColumns(df: DataFrame, required: Seq[String]): Either[List[String], DataFrame] = {
    val missing = required.filterNot(df.columns.contains)
    if (missing.isEmpty) Right(df)
    else Left(missing.map(c => s"missing required column: $c").toList)
  }

  /** k-anonymity audit over a quasi-identifier set (Sweeney, "k-anonymity:
    * a model for protecting privacy", 2002): a row is re-identifiable when
    * its quasi-identifier combination is shared by fewer than k rows.
    * Returns the one-row audit `(n_groups, n_risky_groups, n_risky_rows)` —
    * the release gate a dataset must pass BEFORE the PII scrub is trusted
    * (scrubbing direct identifiers does nothing about a unique
    * (zip, birthdate, sex)-style combination).  One hash aggregation over
    * the quasi columns + one bounded re-aggregation: the same two-phase
    * shape as every profile here, nothing driver-side. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("__n") < k, 1)).as("n_risky_groups"),
        coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L)).as("n_risky_rows"))
  }

  /** Welch's two-sample t statistic between the `valueCol` means of the
    * `inA` and !`inA` halves — the parametric LOCATION test completing
    * the drift family (PSI/KS/chi² detect shape and label shifts; Welch
    * answers the narrower, more sensitive "did the MEAN move, given
    * unequal variances?").  t = (μa−μb)/√(va/na + vb/nb) with sample
    * variances v = (sxx − sx²/n)/(n−1).  Returns ONE row `(n_a, n_b,
    * mean_a, mean_b, t)`; |t| ≳ 3 on large n flags a real shift.
    * Degenerate inputs fail LOUDLY (the [[ksDrift]] discipline): a side
    * with n < 2, or whose values are all NULL, throws naming the side —
    * never a silent null/NaN statistic feeding a gate decision.  That
    * check makes CONSTRUCTION AN ACTION: the moment collect runs a Spark
    * job when the frame is BUILT, so plan-only consumers (explain, a
    * census sweep, lazy composition) trigger execution here and a
    * degenerate slice throws at build time, not first collect.
    *
    * Determinism: the conditional Σx and Σx² accumulate in
    * DECIMAL(38,6) (exact for ≤3-dp inputs at any scale, quantized
    * otherwise — the [[psiDrift]] family's discipline), and everything
    * after is fixed-order IEEE on those two reproducible doubles per
    * side.  Scale shape: ONE map-side-combined aggregation, no shuffle
    * beyond it.  Both sides need n ≥ 2. */
  def welchT(df: DataFrame, valueCol: org.apache.spark.sql.Column,
             inA: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 6))).cast("double")
    val v = df.select(valueCol.cast("double").as("__x"), inA.as("__a"))
    // the moments collect (ONE map-side-combined job, six scalars) so the
    // degenerate shapes can refuse loudly before any statistic is built;
    // the result frame rebuilds from the collected literals under the
    // SAME column expressions, so the IEEE op sequence is unchanged
    val row = v.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      dsum(when(col("__a"), col("__x"))).as("__sa"),
      dsum(when(!col("__a"), col("__x"))).as("__sb"),
      dsum(when(col("__a"), col("__x") * col("__x"))).as("__saa"),
      dsum(when(!col("__a"), col("__x") * col("__x"))).as("__sbb"))
      .collect().head
    val (na, nb) = (row.getLong(0), row.getLong(1))
    require(na >= 2 && nb >= 2,
      s"welchT: both sides need n >= 2 (n_a = $na, n_b = $nb)")
    require(!row.isNullAt(2) && !row.isNullAt(4),
      s"welchT: side A's $na values are all NULL after the double cast")
    require(!row.isNullAt(3) && !row.isNullAt(5),
      s"welchT: side B's $nb values are all NULL after the double cast")
    val g = df.sparkSession.range(1).select(
      lit(na).as("n_a"), lit(nb).as("n_b"),
      lit(row.getDouble(2)).as("__sa"), lit(row.getDouble(3)).as("__sb"),
      lit(row.getDouble(4)).as("__saa"), lit(row.getDouble(5)).as("__sbb"))
    val ma = col("__sa") / col("n_a")
    val mb = col("__sb") / col("n_b")
    val va = (col("__saa") - col("__sa") * col("__sa") / col("n_a")) /
      (col("n_a") - 1)
    val vb = (col("__sbb") - col("__sb") * col("__sb") / col("n_b")) /
      (col("n_b") - 1)
    // the div/sqrt chain can diverge by one ulp across engines (empirical:
    // DuckDB vs JVM differ in the last bit on this exact shape) — the
    // 9-dp rounding both sides is the family's standard absorber
    g.withColumn("mean_a", ma).withColumn("mean_b", mb)
      .withColumn("t",
        round((ma - mb) / sqrt(va / col("n_a") + vb / col("n_b")), 9))
      .select("n_a", "n_b", "mean_a", "mean_b", "t")
  }

  /** Gini coefficient of a positive numeric column — the inequality lens
    * beside [[hhi]]'s categorical concentration: G = 2·Σrᵢxᵢ/(n·Σx) −
    * (n+1)/n over the ascending-sorted values (0 = perfectly equal,
    * →1 = one row holds everything).  The rank-weighted form needs a
    * GLOBAL ordering — done guardrail-clean with [[Relational
    * .withGlobalRowOffsets]] paged by value octave (⌊log₂x⌋, a prefix of
    * the ascending order, ≤ 64 pages for any positive doubles), so no
    * partition-less window exists and driver state is page counts only.
    * Rows with x ≤ 0 are excluded (outside the measure's domain and the
    * log paging).  Returns ONE row `(n, sum_x, gini)`.
    *
    * Determinism: tie ranks permute freely within equal x but Σrᵢxᵢ is
    * invariant under that permutation; each rᵢxᵢ is an exact double for
    * 2-dp values up to ~10¹³ (past that, quantization — not order —
    * bounds error), summed in DECIMAL(38,6); the final expression is
    * fixed-order IEEE on those reproducible terms. */
  def gini(df: DataFrame, valueCol: org.apache.spark.sql.Column,
           idCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val keyed = df.select(valueCol.cast("double").as("__x"), idCol.as("__id"))
      .filter(col("__x") > 0)
      .withColumn("__page", floor(log2(col("__x"))).cast(LongType))
      .withColumn("__k", struct(col("__x"), col("__id")))
    Relational.withGlobalRowOffsets(keyed, "__page", "__k")
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(DecimalType(38, 6))).cast("double").as("sum_x"),
        sum((col("global_row") * col("__x")).cast(DecimalType(38, 6)))
          .cast("double").as("__srx"))
      .withColumn("gini", lit(2) * col("__srx") / (col("n") * col("sum_x"))
        - (col("n") + 1) / col("n"))
      .select("n", "sum_x", "gini")
  }

  /** Herfindahl–Hirschman concentration of a categorical mix — HHI =
    * Σ shareᵢ², the measurement twin of the domain-quota CAP: a training
    * mix dominated by one source scores toward 1, a uniform mix over g
    * groups scores 1/g, so trending this one number across ingests
    * catches "the crawl quietly became 60% one domain" before a quota
    * fires.  Returns ONE row `(n_groups, n_rows, hhi, top_share)`.
    * Scale shape: one map-side-combined groupBy (bounded by group
    * cardinality) + a broadcast 1-row total; shares are BIGINT/BIGINT
    * IEEE divisions, per-group terms 9-dp-rounded and DECIMAL-summed. */
  def hhi(df: DataFrame, groupCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val counts = df.select(groupCol.as("g")).groupBy("g")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("__nn"))
    val share = col("n") / col("__nn")
    counts.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_groups"), first("__nn").as("n_rows"),
        sum(round(share * share, 9).cast(DecimalType(38, 9)))
          .cast("double").as("hhi"),
        max(share).as("top_share"))
  }

  /** Mutual information between two categorical columns — the
    * association profiler beside [[chi2Drift]]'s homogeneity test: MI =
    * Σ_cells p(x,y)·ln[p(x,y)/(p(x)p(y))] in nats, 0 iff independent,
    * and unlike chi² it is an EFFECT SIZE (doesn't grow with n at fixed
    * association), so it ranks column pairs comparably — the signal a
    * feature-redundancy or leakage audit wants ("does the split column
    * predict the label?").  Returns one row per observed cell `(x, y,
    * n_xy, n_x, n_y, mi_term)` ordered by (x, y); the headline MI is the
    * consumer's decimal-exact sum of the 9-dp-rounded terms.  Every term
    * is ≥ 0 would be FALSE here (cells under independence go negative) —
    * the sum, not the terms, is nonnegative.
    *
    * Determinism: the probability ratio is computed as
    * (n_xy/n_x)/(n_y/n) — three BIGINT/BIGINT IEEE divisions, never the
    * BIGINT product n_xy·n (which overflows at lake-scale counts) — and
    * the ln is 9-dp-rounded inside the term.  Scale shape: ONE groupBy
    * on the cell; both marginals re-aggregate from the cell table
    * (bounded by label-cardinality², never the data), totals broadcast. */
  def mutualInfo(df: DataFrame, xCol: org.apache.spark.sql.Column,
                 yCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = df.select(xCol.as("x"), yCol.as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy("x").agg(sum("n_xy").as("n_x"))
    val my = cells.groupBy("y").agg(sum("n_xy").as("n_y"))
    val tot = cells.agg(sum("n_xy").as("__n"))
    cells.join(mx, Seq("x")).join(my, Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("mi_term", round((col("n_xy") / col("__n")) *
        log((col("n_xy") / col("n_x")) / (col("n_y") / col("__n"))), 9))
      .select("x", "y", "n_xy", "n_x", "n_y", "mi_term")
      .orderBy("x", "y")
  }

  /** l-diversity audit (Machanavajjhala et al., "l-diversity: privacy
    * beyond k-anonymity", 2007) — the attack [[kAnonymity]] misses: a
    * group of 50 rows is k-safe, but if all 50 share ONE sensitive value
    * the attacker learns it without re-identifying anybody (homogeneity
    * attack).  A group is risky when its sensitive attribute takes fewer
    * than l distinct values.  Returns the one-row audit `(n_groups,
    * n_risky_groups, n_risky_rows, min_diversity)`; release requires
    * BOTH gates.  Scale shape: two chained hash aggregations — (quasi ×
    * sensitive) then quasi — both map-side combined, then a bounded
    * one-row reduce; the distinct count per group falls out of the first
    * aggregation's row count, so no countDistinct expansion. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: org.apache.spark.sql.Column, l: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    df.groupBy((quasiCols.map(col) :+ sensitiveCol.as("__s")): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__d"), sum("__n").as("__rows"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("__d") < l, 1)).as("n_risky_groups"),
        coalesce(sum(when(col("__d") < l, col("__rows"))), lit(0L)).as("n_risky_rows"),
        min("__d").as("min_diversity"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, "t-closeness: privacy
    * beyond k-anonymity and l-diversity", ICDE'07) — the SKEWNESS attack
    * [[lDiversity]] misses: a group whose sensitive values are diverse but
    * distributed far from the corpus-wide distribution still leaks (49 of
    * 50 rows in the rare band of an attribute that is 1% rare corpus-wide
    * tells the attacker plenty without re-identifying anybody).  A class
    * is risky when the Earth-Mover's Distance between its sensitive-value
    * distribution and the GLOBAL one exceeds t; for an ORDERED attribute
    * with m distinct values the paper's ground metric gives
    * `EMD = Σ_i |Σ_{j≤i} (p_j − q_j)| / (m − 1)`.
    *
    * Returns one row per equivalence class `(quasi…, n_rows, t_emd,
    * risky)`, ordered by the quasi columns — the per-class diagnostic the
    * one-row gates summarize away; compose `.agg(max("t_emd"))` for the
    * release gate.
    *
    * Determinism: the cumulative differences accumulate as exact INTEGERS
    * on the common denominator n_c·n_g — `cum(cnt_c·n_g − cnt_g·n_c)` —
    * so per class the EMD is ONE double division of an exact int64 pair;
    * no float accumulation order exists anywhere.  The int64 bound
    * (counts×corpus) is enforced loudly at ~3×10⁹ rows (lift both sides
    * to DECIMAL beyond that); like [[welchT]], CONSTRUCTION IS AN ACTION —
    * the bound/m checks collect a one-row aggregate at build time so a
    * degenerate attribute refuses before any statistic is built.
    *
    * Scale shape: one (quasi × value) aggregation, a re-aggregation to
    * class totals, and a classes×m grid from a crossJoin whose broadcast
    * side is the m-row distinct-value dimension (m is the sensitive
    * attribute's alphabet — bounded by construction, this is never a
    * corpus×corpus product); the cumulative sum is a window partitioned
    * by class — one shuffle on the class key. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: org.apache.spark.sql.Column, t: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(t > 0 && t < 1, s"tCloseness: t must be in (0, 1), got $t")
    val q = quasiCols.map(col)
    val base = df.select((q :+ sensitiveCol.as("__v")): _*)
      .filter(col("__v").isNotNull)
    val cls = base.groupBy((q :+ col("__v")): _*).agg(count(lit(1)).as("__cnt"))
    val vals = cls.groupBy("__v").agg(sum("__cnt").cast("long").as("__g"))
    val head = vals.agg(count(lit(1)), coalesce(sum("__g"), lit(0L))).collect().head
    val (m, ng) = (head.getLong(0), head.getLong(1))
    require(m >= 2,
      s"tCloseness: sensitive attribute has $m distinct non-null value(s) — " +
        "the ordered EMD needs an alphabet of ≥ 2")
    require(ng <= 3000000000L,
      s"tCloseness: $ng rows — the exact integer EMD accumulates counts×corpus " +
        "in int64; beyond ~3e9 rows lift the accumulation to DECIMAL")
    val nc = cls.groupBy(q: _*).agg(sum("__cnt").cast("long").as("__nc"))
    val grid = nc.crossJoin(broadcast(vals)) // |classes| × m, m alphabet-bounded
    val full = grid.join(cls, quasiCols :+ "__v", "left")
      .withColumn("__num",
        coalesce(col("__cnt"), lit(0L)) * lit(ng) - col("__g") * col("__nc"))
    val w = Window.partitionBy(q: _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full.withColumn("__cum", sum("__num").over(w))
      .groupBy((q :+ col("__nc")): _*)
      .agg(sum(abs(col("__cum"))).cast("long").as("__emd_num"))
      .withColumn("t_emd", round(col("__emd_num").cast("double") /
        (lit((m - 1).toDouble) * col("__nc").cast("double") * lit(ng.toDouble)), 9))
      .withColumn("risky", col("t_emd") > t)
      .select((q :+ col("__nc").as("n_rows") :+ col("t_emd") :+ col("risky")): _*)
      .orderBy(q: _*)
  }

  /** Q2 — error-tolerant runner (ref `load_duckdb_data.py:42-46`): apply each
    * step, log-and-continue on failure, return successes. */
  def runTolerant[A](steps: Seq[(String, () => A)]): (List[(String, A)], List[(String, Throwable)]) = {
    val results = steps.map { case (name, f) => name -> Try(f()).toEither }
    (results.collect { case (n, Right(a)) => n -> a }.toList,
     results.collect { case (n, Left(e)) => n -> e }.toList)
  }
}
