package graft

import graft.engine.Extract

/** Support case classes for [[ExtractFuzzSpec]] — the recorded-block shape
  * of [[Extract.blockSchema]] (field names match the Textract JSON). */
case class ExFuzzRel(Type: String, Ids: Seq[String])
case class ExFuzzBlock(Id: String, BlockType: String, Text: Option[String],
    Page: Option[Int], RowIndex: Option[Int], ColumnIndex: Option[Int],
    Relationships: Option[Seq[ExFuzzRel]])

/** Randomized GRID-ROUNDTRIP fuzz for the S4 block→table reconstruction:
  * generate a random sparse multi-page grid model (random row/column
  * subsets, 0–3 words per cell, shuffled block order, plus the adversarial
  * edges the reference's dict-based reconstruction is known to be fragile
  * around — cells with no CHILD relationship, dangling child ids, non-CHILD
  * relationship types that must be ignored), serialize it to WORD/CELL
  * blocks, run [[Extract.reconstructTable]], and compare every output row
  * (global_row, page, row, cells) against the model: densify width is the
  * GLOBAL max column, absent cells read "", word order inside a cell follows
  * the CHILD Ids order, dangling ids contribute nothing, and global row
  * numbers are the 1-based (page, row) sort positions.  The targeted
  * ExtractSpec cases pin each edge once; this suite pins their
  * COMPOSITIONS under random layouts, independent of block input order.
  */
class ExtractFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  for (seed <- FuzzSeeds.seeds(17L, 251L)) {
    test(s"random sparse grid (seed $seed): reconstructTable reproduces the " +
      "model whatever the block order") {
      val rng = new scala.util.Random(seed)
      // model: (page, row) -> (col -> words); rows/cols sparse and
      // non-contiguous on purpose
      val grid = (for {
        page <- 1 to 3
        row <- rng.shuffle((1 to 6).toList).take(1 + rng.nextInt(5))
      } yield {
        val cols = rng.shuffle((1 to 5).toList).take(1 + rng.nextInt(4))
        (page, row) -> cols.map { c =>
          c -> (0 until rng.nextInt(4)).map(i => s"t$page-$row-$c-$i")
        }.toMap
      }).toMap

      val blocks = scala.collection.mutable.ArrayBuffer[ExFuzzBlock]()
      grid.foreach { case ((page, row), cells) =>
        cells.foreach { case (c, words) =>
          val wordIds = words.zipWithIndex.map { case (w, i) =>
            val id = s"w-$page-$row-$c-$i"
            blocks += ExFuzzBlock(id, "WORD", Some(w), None, None, None, None)
            id
          }
          // adversarial edges: a dangling child id spliced mid-list must
          // contribute nothing; a non-CHILD relationship must be ignored;
          // an empty cell sometimes carries NO relationship at all
          val withDangling =
            if (rng.nextInt(4) == 0) {
              val k = rng.nextInt(wordIds.size + 1)
              (wordIds.take(k) :+ s"missing-$page-$row-$c") ++ wordIds.drop(k)
            } else wordIds
          val rels = scala.collection.mutable.ArrayBuffer[ExFuzzRel]()
          if (rng.nextInt(3) == 0)
            rels += ExFuzzRel("MERGED_CELL", Seq(s"noise-$page-$row-$c"))
          if (withDangling.nonEmpty || rng.nextBoolean())
            rels += ExFuzzRel("CHILD", withDangling)
          blocks += ExFuzzBlock(s"c-$page-$row-$c", "CELL", None,
            Some(page), Some(row), Some(c),
            if (rels.isEmpty) None else Some(rels.toSeq))
        }
      }

      val df = rng.shuffle(blocks.toList).toDS().toDF()
      val got = Extract.reconstructTable(df)
        .select("global_row", "page", "row", "cells")
        .as[(Long, Int, Int, Seq[String])].collect().toSeq.sortBy(_._1)

      val maxCol = grid.values.flatMap(_.keys).max
      val want = grid.toSeq.sortBy { case ((p, r), _) => (p, r) }
        .zipWithIndex.map { case (((page, row), cells), i) =>
          val dense = (1 to maxCol).map(c =>
            cells.get(c).map(_.mkString(" ")).getOrElse(""))
          (i + 1L, page, row, dense: Seq[String])
        }
      assert(got == want,
        s"seed $seed: reconstruction diverged\n  got  ${got.take(5)}...\n" +
          s"  want ${want.take(5)}...")
    }
  }
}
