package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4 — table reconstruction from recorded Textract-style block JSON
  * (ref `src/etl/ingest_harvest_data.py:177-222`,
  * `src/etl/ingest_population_data.py:128-163`).
  *
  * The reference builds an in-memory `Id→Text` dict from WORD blocks, then for
  * each CELL block joins its CHILD word ids, producing a `{row:{col:text}}`
  * grid densified to `List[List[str]]`, with multi-page tables concatenated
  * under a running row offset.  Re-expressed relationally:
  *
  *   WORD df ⋈ (CELL df with CHILD ids exploded)  — an equi-join on word id
  *   → groupBy(page,row,col) ordered word join    — `concat_ws(collect_list)`
  *   → densify to a fixed-width array per row     — map_from + sequence lookup
  *   → pages unioned with cumulative row offsets  — window over page
  *
  * Everything is shuffled by (page,row) keys — no driver-side dict, so a
  * million-page corpus distributes.  The reference's population path forgot
  * `NextToken` pagination (`ingest_population_data.py:125`, truncation bug);
  * a recorded-block source has no such failure mode (SURVEY §7.4.4).
  *
  * Side-effectful Textract calls stay OUT of the engine (network boundary —
  * SURVEY §7.4.5); the engine consumes recorded block JSON, deterministic and
  * testable.
  */
object Extract {

  /** Expected block schema (FIXTURES.md §A4). */
  val blockSchema = "Id STRING, BlockType STRING, Text STRING, Page INT, " +
    "RowIndex INT, ColumnIndex INT, " +
    "Relationships ARRAY<STRUCT<Type: STRING, Ids: ARRAY<STRING>>>"

  def parseBlocks(spark: SparkSession, jsonPath: String): DataFrame =
    spark.read.schema(blockSchema).json(jsonPath)

  /** Blocks → dense cell grid: one row per (page, row) with a fixed-width
    * `cells ARRAY<STRING>` (missing cells densified to ""). */
  def reconstructCells(blocks: DataFrame): DataFrame = {
    val words = blocks.filter(col("BlockType") === "WORD").select(
      col("Id").as("word_id"), col("Text").as("word"))
    val cellChildren = blocks.filter(col("BlockType") === "CELL")
      .select(col("Page").as("page"), col("RowIndex").as("row"),
        col("ColumnIndex").as("column"),
        posexplode_outer(flatten(filter(col("Relationships"),
          r => r.getField("Type") === "CHILD").getField("Ids"))))
      .withColumnRenamed("pos", "word_pos").withColumnRenamed("col", "word_id")
    // join CHILD ids to word texts; cells with no children yield "".
    val cellText = cellChildren
      .join(words, cellChildren("word_id") === words("word_id"), "left")
      .groupBy("page", "row", "column")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("word_pos"), col("word")))), s => s.getField("word")), " ").as("text"))
    // densify: every row carries cells 1..max(col) with "" for absent.  The
    // table-global width travels as a broadcast 1-row frame (no eager driver
    // action mid-pipeline, and an empty blocks input yields 0 rows instead of
    // an NPE — the null max never meets a sequence()).
    val maxCol = broadcast(cellText.agg(max("column").as("__max_col")))
    cellText.groupBy("page", "row")
      .agg(map_from_arrays(collect_list(col("column")), collect_list(col("text"))).as("m"))
      .crossJoin(maxCol)
      .withColumn("cells",
        transform(sequence(lit(1), col("__max_col")), i => coalesce(element_at(col("m"), i), lit(""))))
      .drop("m", "__max_col")
  }

  /** Multi-page concatenation with running row offsets
    * (ref `ingest_harvest_data.py:188-209`): two-stage global row numbers —
    * per-page ranks plus broadcast per-page offsets
    * (Relational.withGlobalRowOffsets), so a million-page corpus never
    * funnels through a single partition-less window task. */
  def concatPages(cells: DataFrame): DataFrame =
    Relational.withGlobalRowOffsets(cells, "page", "row")
      .select("global_row", "page", "row", "cells")

  /** Full S4: blocks → ordered dense grid. */
  def reconstructTable(blocks: DataFrame): DataFrame = concatPages(reconstructCells(blocks))
}
