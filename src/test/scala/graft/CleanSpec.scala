package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.Clean

/** C1–C13 cleaning operators against the dirty-input vectors of
  * FIXTURES.md §A5. */
class CleanSpec extends SparkFunSuite {
  import spark.implicits._

  test("C1 harvest header normalizer strips non [a-z0-9_]") {
    assert(Clean.normalizeHeaderHarvest("Bull/Cow Ratio (Per 100)") === "bullcow_ratio_per_100")
    assert(Clean.normalizeHeaderHarvest("Total Harvest") === "total_harvest")
  }

  test("C2 population normalizer keeps parens, maps / to _per_") {
    assert(Clean.normalizeHeaderPopulation("Bull/Cow Ratio (Per 100)")
      === "bull_per_cow_ratio_(per_100)")
  }

  test("C1/C2 column-expression forms agree with the driver-side forms") {
    val headers = Seq("Bull/Cow Ratio (Per 100)", "Total Harvest", "  Odd  Header!?")
    val df = headers.toDF("h")
    val got = df.select(
      Clean.normalizeHeaderHarvestCol($"h").as("h1"),
      Clean.normalizeHeaderPopulationCol($"h").as("h2")).collect()
    headers.zip(got).foreach { case (h, r) =>
      assert(r.getString(0) === Clean.normalizeHeaderHarvest(h))
      assert(r.getString(1) === Clean.normalizeHeaderPopulation(h))
    }
  }

  test("C3 rename with default-0 fill for absent source columns") {
    val df = Seq((5, 3)).toDF("bulls", "cows") // no calves column
    val out = Clean.renameWithDefaults(df, Clean.SpeciesSexMaps("elk"))
    assert(out.columns.toSet === Set("adult_male", "adult_female", "young"))
    val r = out.select("adult_male", "adult_female", "young").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((5, 3, 0)))
  }

  test("C4 regex rename tolerates the reference's 'unites' typo") {
    val typo = Seq(("7,8", 1)).toDF("game_management_unites_involved_in_2024", "x")
    val ok = Seq(("7,8", 1)).toDF("game_management_units_involved_in_2023", "x")
    val none = Seq(("7,8", 1)).toDF("unrelated", "x")
    assert(Clean.renameByPattern(typo, Clean.GmuHeaderPatterns, "gmu_list")
      .columns.contains("gmu_list"))
    assert(Clean.renameByPattern(ok, Clean.GmuHeaderPatterns, "gmu_list")
      .columns.contains("gmu_list"))
    assert(!Clean.renameByPattern(none, Clean.GmuHeaderPatterns, "gmu_list")
      .columns.contains("gmu_list"))
  }

  test("C5 coalesce across header variants picks the first present, drops originals") {
    val df = Seq((1.5, 0)).toDF("bull_per_cow_ratio_(per_100)", "x")
    val out = Clean.coalesceFirstPresent(df,
      Seq("bull_cow_ratio_(per_100)", "bull_per_cow_ratio_(per_100)"), "male_female_ratio")
    assert(out.columns.toSet === Set("x", "male_female_ratio"))
    assert(out.select("male_female_ratio").head().getDouble(0) === 1.5)
  }

  test("C7 coercion: comma strip, trim, garbage to null (≡ to_numeric coerce)") {
    val df = Seq("1,234", " 42 ", "n/a", "", "7").toDF("raw")
    val got = df.select(Clean.coerceNumeric($"raw").as("v")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(1234L), Some(42L), None, None, Some(7L)))
  }

  test("C8 unit normalization: leading zeros, '0' divergence fix, non-digits null") {
    val df = Seq("07", "12a", "0", "000", " 5 ", "", "1 2").toDF("u")
    val got = df.select(Clean.normalizeUnit($"u").as("unit")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    // reference crashes on "0"/"000" (int("") after lstrip); we yield 0.
    assert(got.toSeq === Seq(Some(7), None, Some(0), Some(0), Some(5), None, None))
  }

  test("C9 herd name derivation") {
    val got = Seq(17).toDF("dau")
      .select(Clean.herdNameFromDau($"dau").as("h")).head().getString(0)
    assert(got === "DAU_17")
  }

  test("C10 csv to int array trims spaces like DuckDB's cast") {
    val got = Seq("7, 8 ,9,  191").toDF("g")
      .select(Clean.csvToIntArray($"g").as("a")).head().getSeq[Int](0)
    assert(got === Seq(7, 8, 9, 191))
  }

  test("C13 year extraction from filenames") {
    val got = Seq("colorado_elk_population_2023.pdf").toDF("f")
      .select(Clean.extractYear($"f").as("y")).head().getInt(0)
    assert(got === 2023)
  }

  test("C14 STATE_MAP: known abbrevs map case-insensitively, unknown raises the reference error") {
    assert(Clean.stateFullName("CO") === "colorado")
    assert(Clean.stateFullName("wy") === "wyoming")
    val e = intercept[IllegalArgumentException](Clean.stateFullName("tx"))
    assert(e.getMessage === "State 'tx' not supported yet.")
  }

  test("C14 column form: strict raises at execution, tolerant yields NULL") {
    val ok = Seq("CO", "nm").toDF("st")
      .select(Clean.stateFullNameCol($"st").as("f")).collect().map(_.getString(0))
    assert(ok.toSeq === Seq("colorado", "new_mexico"))
    val err = intercept[Throwable](
      Seq("tx").toDF("st").select(Clean.stateFullNameCol($"st")).collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(err).contains("not supported yet"))
    assert(Seq("tx").toDF("st")
      .select(Clean.stateFullNameCol($"st", strict = false)).head().isNullAt(0))
  }

  test("property: coerceNumeric is null iff comma-stripped input is not a valid integral") {
    // batch the samples into one plan — per-sample Spark jobs would dominate.
    val longs = Gen.listOfN(200, Gen.long).sample.get
    val junk = Gen.listOfN(200, Gen.asciiPrintableStr).sample.get
      .filterNot { s => // drop anything numeric-ish (incl. floats ANSI cast may truncate)
        val t = s.replace(",", "").trim
        t.matches("[+-]?\\d+") || scala.util.Try(t.toDouble).isSuccess
      }
    val got = (longs.map(_.toString) ++ junk).toDF("raw")
      .select($"raw", Clean.coerceNumeric($"raw").as("v")).collect()
    got.take(longs.size).zip(longs).foreach { case (r, n) =>
      assert(!r.isNullAt(1) && r.getLong(1) === n, s"for input '${r.getString(0)}'")
    }
    got.drop(longs.size).foreach { r =>
      assert(r.isNullAt(1), s"expected null for input '${r.getString(0)}'")
    }
    // keep scalacheck engaged on the pure normalizers too (no Spark in the loop)
    val prop = Prop.forAll(Gen.asciiPrintableStr) { h =>
      Clean.normalizeHeaderHarvest(h).matches("[a-z0-9_]*")
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
