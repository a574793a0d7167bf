package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** Randomized model fuzz for the custom bounded-heap physical operator
  * ([[TopKPerKey]]): random data with heavy ordering ties (the order is
  * made total by an id tiebreak, as the operator's contract requires),
  * random k and random asc/desc order shapes, checked row-for-row against
  * a sort-and-take model — then the SAME checks re-run with the spill
  * thresholds forced to a few rows, so the heap-map → sorted-run →
  * merge-pass SPILL path executes under random data, not just the
  * targeted spill case.  Seeds fixed.
  */
class TopKFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  for (seed <- FuzzSeeds.seeds(103L, 271L)) {
    test(s"random data (seed $seed): heap top-k equals sort-take, in-memory " +
      "and under forced spill") {
      val rng = new scala.util.Random(seed)
      val data: Seq[(Long, Long, Long, Long)] = (1 to 150).map { i =>
        (1L + rng.nextLong(5), rng.nextLong(6), rng.nextLong(1000), i.toLong)
      }
      val df = data.toDF("key", "a", "b", "id")
      val k = 1 + rng.nextInt(5)
      val descA = rng.nextBoolean()

      def modelTake(): Set[(Long, Long, Long, Long)] =
        data.groupBy(_._1).values.flatMap { rows =>
          val sorted = rows.sortBy { case (_, a, _, id) =>
            (if (descA) -a else a, id)
          }
          sorted.take(k)
        }.toSet
      val order = Seq(if (descA) col("a").desc else col("a").asc, col("id").asc)

      def run(): Set[(Long, Long, Long, Long)] =
        TopKPerKey(df, Seq("key"), order, k)
          .as[(Long, Long, Long, Long)].collect().toSet

      assert(run() == modelTake(),
        s"seed $seed: in-memory heap top-k (k=$k, descA=$descA) diverged")

      // force the spill path: a handful of retained rows per partition
      val conf = spark.conf
      val prevRows = conf.getOption(TopKPerKey.SpillConfKey)
      try {
        conf.set(TopKPerKey.SpillConfKey, math.max(4, k).toString)
        assert(run() == modelTake(),
          s"seed $seed: SPILLED heap top-k (k=$k, descA=$descA) diverged")
      } finally prevRows match {
        case Some(v) => conf.set(TopKPerKey.SpillConfKey, v)
        case None => conf.unset(TopKPerKey.SpillConfKey)
      }
    }

    test(s"random data (seed $seed): DISTINCT heap equals distinct-sort-take, " +
      "in-memory and under forced spill") {
      // distinct-mode contract: the ordering determines the row within a
      // key, so rows here are exactly (key, a) with heavy duplication —
      // the KMV layout.  Model = per-key distinct, sort, take k.
      val rng = new scala.util.Random(seed * 7919L)
      val data: Seq[(Long, Long)] = (1 to 200).map { _ =>
        (1L + rng.nextLong(4), rng.nextLong(12))
      }
      val df = data.toDF("key", "a").repartition(5) // dups cross partitions
      val k = 1 + rng.nextInt(5)
      def model(): Set[(Long, Long)] =
        data.distinct.groupBy(_._1).values.flatMap(_.sortBy(_._2).take(k)).toSet
      def run(): Set[(Long, Long)] =
        TopKPerKey(df, Seq("key"), Seq(col("a").asc), k, distinct = true)
          .as[(Long, Long)].collect().toSet
      assert(run() == model(),
        s"seed $seed: in-memory DISTINCT heap top-k (k=$k) diverged")
      val conf = spark.conf
      val prevRows = conf.getOption(TopKPerKey.SpillConfKey)
      try {
        conf.set(TopKPerKey.SpillConfKey, math.max(4, k).toString)
        assert(run() == model(),
          s"seed $seed: SPILLED distinct heap top-k (k=$k) diverged")
      } finally prevRows match {
        case Some(v) => conf.set(TopKPerKey.SpillConfKey, v)
        case None => conf.unset(TopKPerKey.SpillConfKey)
      }
    }
  }
}
