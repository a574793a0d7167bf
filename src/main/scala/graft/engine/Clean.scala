package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level cleaning operators (SURVEY §2.3, C1–C13).
  *
  * Everything here is a pure `Column` expression — no UDFs, no driver-side
  * row loops — so the whole suite stays inside whole-stage codegen and scales
  * linearly with input.  The reference implements these as pandas per-row
  * lambdas (`src/etl/ingest_harvest_data.py:225-294`,
  * `src/etl/ingest_population_data.py:166-274`); we re-express each as a
  * vectorizable expression with identical observable semantics (divergences
  * documented inline).
  */
object Clean {

  /** C1 — harvest header normalizer: lowercase, spaces→`_`, strip everything
    * outside `[a-z0-9_]` (ref `ingest_harvest_data.py:225-231`). Pure Scala:
    * headers are driver-side metadata. */
  def normalizeHeaderHarvest(h: String): String =
    h.toLowerCase.replace(" ", "_").replaceAll("[^a-z0-9_]", "")

  /** C2 — population header normalizer: lowercase, spaces→`_`, `/`→`_per_`,
    * parens KEPT (ref `ingest_population_data.py:185`) — deliberately distinct
    * from C1; produces headers like `bull_cow_ratio_(per_100)`. */
  def normalizeHeaderPopulation(h: String): String =
    h.toLowerCase.replace(" ", "_").replace("/", "_per_")

  /** Column-expression forms of C1/C2 for when the "header" travels as data
    * (oracle-checkable). */
  def normalizeHeaderHarvestCol(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), " ", "_"), "[^a-z0-9_]", "")
  def normalizeHeaderPopulationCol(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), " ", "_"), "/", "_per_")

  /** Apply a header normalizer to all columns of a frame. */
  def normalizeHeaders(df: DataFrame, f: String => String): DataFrame =
    df.toDF(df.columns.map(f).toIndexedSeq: _*)

  /** C3 — rename via static species map with default-0 fill for absent source
    * columns (ref `ingest_harvest_data.py:35-39,267-276`): elk bulls/cows/calves
    * → adult_male/adult_female/young, etc. */
  val SpeciesSexMaps: Map[String, Map[String, String]] = Map(
    "elk"       -> Map("bulls" -> "adult_male", "cows" -> "adult_female", "calves" -> "young"),
    "deer"      -> Map("bucks" -> "adult_male", "does" -> "adult_female", "fawns" -> "young"),
    "pronghorn" -> Map("bucks" -> "adult_male", "does" -> "adult_female", "fawns" -> "young"))

  def renameWithDefaults(df: DataFrame, renames: Map[String, String],
                         default: Column = lit(0)): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to)
      else d.withColumn(to, default)
    }

  /** C4 — rename via regex-matched header, tolerant of the reference PDFs'
    * `unites` typo (ref `ingest_population_data.py:209-233`). */
  val GmuHeaderPatterns: Seq[String] =
    Seq("game_management_units_involved_in_\\d{4}", "game_management_unites_involved_in_\\d{4}")
  def renameByPattern(df: DataFrame, patterns: Seq[String], to: String): DataFrame =
    df.columns.find(c => patterns.exists(c.matches)) match {
      case Some(from) => df.withColumnRenamed(from, to)
      case None       => df
    }

  /** C5 — coalesce across header variants: first present of `variants`
    * becomes `target`, originals dropped (ref `ingest_population_data.py:202-206,243-261`). */
  def coalesceFirstPresent(df: DataFrame, variants: Seq[String], target: String): DataFrame = {
    val present = variants.filter(df.columns.contains)
    if (present.isEmpty) df
    else present.foldLeft(df.withColumn(target, coalesce(present.map(col): _*)))(_ drop _)
  }

  /** C6 — literal metadata columns (ref `ingest_harvest_data.py:251-254`). */
  def withMetadata(df: DataFrame, meta: (String, Any)*): DataFrame =
    meta.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }

  /** C7 — numeric coercion with thousands-separator strip; garbage → null
    * (≡ pandas `to_numeric(errors="coerce")`, ref `ingest_harvest_data.py:288-292`).
    * `try_cast` keeps coerce semantics under Spark 4's default ANSI mode. */
  def coerceNumeric(c: Column, to: DataType = LongType): Column =
    regexp_replace(c, ",", "").try_cast(to)

  /** C8 — unit normalization: digits-only → int (leading zeros stripped by the
    * cast), else null (ref `ingest_harvest_data.py:256-262`).  DIVERGENCE: the
    * reference crashes on `"0"`/`"000"` (`int("")` after lstrip); we yield 0 —
    * documented in SURVEY §7.4. */
  def normalizeUnit(c: Column): Column =
    when(trim(c).rlike("^[0-9]+$"), trim(c).try_cast(IntegerType))

  /** C9 — derived `herd_name = "DAU_" + dau` when absent
    * (ref `ingest_population_data.py:263-272`). */
  def herdNameFromDau(dau: Column): Column = concat(lit("DAU_"), dau.cast(StringType))

  /** C10 — CSV string → typed int array (ref `load_population_production.sql:26`);
    * Spark's element cast trims spaces exactly like DuckDB's. */
  def csvToIntArray(c: Column): Column = split(c, ",").cast("array<int>")

  /** C13 — regex-extract a 4-digit year from a filename
    * (ref `ingest_harvest_data.py:355`). */
  def extractYear(c: Column): Column =
    regexp_extract(c, "(\\d{4})", 1).try_cast(IntegerType)

  /** C14 — state abbreviation → full-name lookup
    * (ref `ingest_harvest_data.py:20-33,327-330`). */
  val StateMap: Map[String, String] = Map(
    "ak" -> "alaska", "az" -> "arizona", "ca" -> "california",
    "co" -> "colorado", "id" -> "idaho", "mt" -> "montana",
    "nm" -> "new_mexico", "nv" -> "nevada", "or" -> "oregon",
    "ut" -> "utah", "wa" -> "washington", "wy" -> "wyoming")

  /** Driver-side form: unknown state raises, mirroring the reference's
    * `ValueError(f"State '{state}' not supported yet.")`. */
  def stateFullName(abbrev: String): String =
    StateMap.getOrElse(abbrev.toLowerCase,
      throw new IllegalArgumentException(s"State '$abbrev' not supported yet."))

  /** Column form: a literal-map lookup (codegen'd, no UDF).  With
    * `strict = true` an unknown abbreviation fails the job at execution with
    * the reference's message (`raise_error`); with `strict = false` it maps
    * to NULL (the tolerant-pipeline variant). */
  def stateFullNameCol(c: Column, strict: Boolean = true): Column = {
    val looked = element_at(typedlit(StateMap), lower(c))
    if (strict)
      when(looked.isNull,
        raise_error(concat(lit("State '"), c, lit("' not supported yet."))))
        .otherwise(looked)
    else looked
  }
}
