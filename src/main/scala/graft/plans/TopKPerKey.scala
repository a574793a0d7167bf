package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (the brief's tier (c)): per-key top-k via
  * BOUNDED HEAPS — `TopKPerKeyPlan` (logical) → [[TopKPerKeyStrategy]] →
  * [[TopKPerKeyExec]] (physical).
  *
  * Why a custom operator when `row_number().over(partitionBy(key)) <= k`
  * exists: the window form SORTS every partition in full — O(n log n) per
  * partition, spilling whole groups through the sorter to keep k rows of
  * each.  The heap form does one pass with O(keys × k) state and
  * O(n log k) comparisons: at 100 TB with million-row groups and k = 10,
  * that is the difference between sorting everything and streaming it.
  * (Spark's own `TakeOrderedAndProject` is exactly this trick for the
  * GLOBAL top-k; this operator is its per-key generalization.)
  *
  * Semantics: for each distinct value of `groupExprs`, the first `k` child
  * rows under `ordering` — identical to the window-rank filter when the
  * ordering is total (ties would otherwise make both forms
  * nondeterministic; give the ordering a unique tie-break column).
  * Requires ClusteredDistribution on the group keys, so EnsureRequirements
  * inserts the one hash exchange; no sort is ever requested.
  *
  * MEMORY CONTRACT: retained state is keys × k row copies per partition —
  * tiny for few hot keys, but on HIGH-CARDINALITY keys (near-unique dedup
  * keys, k = 1) it approaches the whole partition.  [[TopKPerKeyExec]]
  * therefore spills: when retained rows exceed
  * `spark.graft.topk.spillRowThreshold` (default 4 194 304), the heap map
  * is dumped to a key-sorted local run file and cleared, and at input end
  * the runs are merge-joined by key with one bounded heap per key at a
  * time — peak memory is threshold × row size regardless of cardinality. */
case class TopKPerKeyPlan(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"TopKPerKey: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: one-to-one logical→physical mapping. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(g, o, k, child) =>
      TopKPerKeyExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical per-key bounded-heap top-k with a disk spill path.  One pass
  * per partition; per-key state is a k-bounded priority queue whose head is
  * the WORST retained row (evicted on a better arrival).  Rows and keys are
  * copied only when retained.  When total retained rows cross
  * `spark.graft.topk.spillRowThreshold`, the whole map is written out as a
  * run file SORTED BY KEY BYTES (UnsafeRow bytes are canonical per value —
  * the same equality the in-memory hash map already relies on) and freed;
  * the final answer is a streaming merge of the runs, one key-run and one
  * k-heap in memory at a time.  The per-segment top-k union is a superset
  * of each key's global top-k, so re-heaping the merged candidates is
  * exact. */
case class TopKPerKeyExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  // rows keep their key co-location: a downstream groupBy/join on the same
  // keys must reuse the heap's exchange, not add a second one
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupLocal = groupExprs
    val orderLocal = ordering
    val kLocal = k
    val spillThreshold =
      conf.getConfString(TopKPerKey.SpillConfKey, "4194304").toLong
    val spillBytes =
      conf.getConfString(TopKPerKey.SpillBytesConfKey, (256L << 20).toString).toLong
    require(spillThreshold >= kLocal,
      s"${TopKPerKey.SpillConfKey} ($spillThreshold) must be >= k ($kLocal)")
    child.execute().mapPartitions { it =>
      new TopKPartitionIterator(it, childOutput, groupLocal, orderLocal,
        kLocal, spillThreshold, spillBytes)
    }
  }
}

/** Per-partition driver of the heap/spill/merge lifecycle. */
private final class TopKPartitionIterator(
    input: Iterator[InternalRow], childOutput: Seq[Attribute],
    groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, spillThreshold: Long, spillBytes: Long) extends Iterator[InternalRow] {

  private val keyProj = UnsafeProjection.create(groupExprs, childOutput)
  private val rowProj = UnsafeProjection.create(childOutput.map(_.asInstanceOf[Expression]), childOutput)
  // best-first total order; the queue's max (head) is the worst retained
  private val rowOrd = RowOrdering.create(ordering, childOutput)
  private val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
  private var retained = 0L
  private var retainedBytes = 0L
  private val spills = mutable.ArrayBuffer.empty[File]
  Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
    spills.foreach(_.delete())
  })

  private def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    heaps.get(key) match {
      case None =>
        val q = mutable.PriorityQueue.empty[UnsafeRow](rowOrd.on[UnsafeRow](identity))
        val r = rowProj(row).copy()
        q.enqueue(r)
        heaps.put(key.copy(), q)
        retained += 1
        retainedBytes += r.getSizeInBytes + key.getSizeInBytes
      case Some(q) =>
        if (q.size < k) {
          val r = rowProj(row).copy()
          q.enqueue(r); retained += 1; retainedBytes += r.getSizeInBytes
        } else if (rowOrd.compare(row, q.head) < 0) {
          val ev = q.dequeue(); val r = rowProj(row).copy()
          q.enqueue(r); retainedBytes += r.getSizeInBytes - ev.getSizeInBytes
        }
    }
  }

  /** Unsigned byte-lexicographic order on serialized UnsafeRow keys — any
    * total order works for the merge as long as every run uses the same
    * one; equal keys have identical bytes (hash-map equality above). */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Executor-local spill root: Spark's configured local dirs
    * (SPARK_LOCAL_DIRS env on YARN/K8s executors, else spark.local.dir),
    * NOT java.io.tmpdir — on real clusters /tmp is often a small root
    * volume, and the local dirs are the disks Spark sizes and wipes on
    * restart.  (DiskBlockManager itself is private[spark]; this resolves
    * the same dirs through the public conf surface.)  First dir of a
    * comma list; task-completion delete remains the per-run cleanup, and
    * a crashed executor's leftovers die with the local-dir wipe. */
  private def spillRoot(): File = {
    val conf = Option(org.apache.spark.SparkEnv.get).map(_.conf)
    val base = sys.env.get("SPARK_LOCAL_DIRS").map(_.split(",").head.trim)
      .orElse(conf.flatMap(_.getOption("spark.local.dir")).map(_.split(",").head.trim))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val d = new File(base, "graft-topk-spills")
    d.mkdirs()
    d
  }

  /** Dump the current map as one key-sorted run and free it. */
  private def spillAll(): Unit = {
    if (heaps.isEmpty) return
    val f = File.createTempFile("graft-topk-spill", ".run", spillRoot())
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    try {
      heaps.toArray.map { case (key, q) => (key.getBytes, q) }
        .sortWith((a, b) => cmpBytes(a._1, b._1) < 0)
        .foreach { case (kb, q) =>
          // best-first within the key so merge output needs no re-sort
          q.dequeueAll.reverseIterator.foreach { (r: UnsafeRow) =>
            val rb = r.getBytes
            out.writeInt(kb.length); out.write(kb)
            out.writeInt(rb.length); out.write(rb)
          }
        }
    } finally out.close()
    spills += f
    heaps.clear()
    retained = 0
    retainedBytes = 0
  }

  /** Sequential reader over one run: exposes the head (keyBytes, row). */
  private final class RunReader(f: File) {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f), 1 << 16))
    private val nFields = childOutput.length
    var keyBytes: Array[Byte] = _
    var row: UnsafeRow = _
    advance()
    def advance(): Boolean = {
      try {
        val kl = in.readInt()
        keyBytes = new Array[Byte](kl); in.readFully(keyBytes)
        val rl = in.readInt()
        val rb = new Array[Byte](rl); in.readFully(rb)
        val r = new UnsafeRow(nFields)
        r.pointTo(rb, rl)
        row = r
        true
      } catch {
        case _: EOFException => in.close(); keyBytes = null; row = null; false
      }
    }
    def exhausted: Boolean = keyBytes == null
  }

  private var resultIter: Iterator[InternalRow] = _

  private def finish(): Iterator[InternalRow] = {
    if (spills.isEmpty) {
      // pure in-memory path: emit each heap best-first
      heaps.iterator.flatMap { case (_, q) => q.dequeueAll.reverseIterator }
    } else {
      spillAll() // the in-memory remainder becomes the last run
      val readers = spills.map(new RunReader(_)).filterNot(_.exhausted)
      // streaming key-merge: pull the minimal key across runs, heap its
      // candidates (≤ runs × k rows), emit, advance — one key in memory
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def loadNextKey(): Unit = {
          val live = readers.filterNot(_.exhausted)
          if (live.isEmpty) return
          val minKey = live.map(_.keyBytes).reduce((a, b) => if (cmpBytes(a, b) <= 0) a else b)
          val q = mutable.PriorityQueue.empty[UnsafeRow](rowOrd.on[UnsafeRow](identity))
          live.foreach { r =>
            while (!r.exhausted && cmpBytes(r.keyBytes, minKey) == 0) {
              if (q.size < k) q.enqueue(r.row)
              else if (rowOrd.compare(r.row, q.head) < 0) { q.dequeue(); q.enqueue(r.row) }
              r.advance()
            }
          }
          pending = q.dequeueAll.reverseIterator
        }
        override def hasNext: Boolean = {
          while (!pending.hasNext && readers.exists(!_.exhausted)) loadNextKey()
          pending.hasNext
        }
        override def next(): InternalRow = pending.next()
      }
    }
  }

  override def hasNext: Boolean = {
    if (resultIter == null) {
      while (input.hasNext) {
        insert(input.next())
        if (retained >= spillThreshold || retainedBytes >= spillBytes) spillAll()
      }
      resultIter = finish()
    }
    resultIter.hasNext
  }
  override def next(): InternalRow = { hasNext; resultIter.next() }
}

/** DataFrame-level entry point: `topKPerKey(df, keys, Seq($"x".desc,
  * $"id".asc), k)`.  Installs [[TopKPerKeyStrategy]] on the session's
  * experimental strategies (idempotent); GraftExtensions also injects it
  * at session build for SQL-configured sessions. */
object TopKPerKey {
  /** Retained-row budget per partition before the heap map spills to a
    * key-sorted local run (see [[TopKPerKeyExec]]'s memory contract). */
  val SpillConfKey = "spark.graft.topk.spillRowThreshold"

  /** Retained-BYTE budget per partition (UnsafeRow sizes) — the companion
    * trigger that protects against wide rows at a modest row count. */
  val SpillBytesConfKey = "spark.graft.topk.spillByteThreshold"

  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ TopKPerKeyStrategy
  }

  def apply(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    val child = df.queryExecution.analyzed
    val orders = order.map(GraftSqlBridge.expr).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(k0 => GraftSqlBridge.expr(df(k0))), orders, k, child))
  }
}
