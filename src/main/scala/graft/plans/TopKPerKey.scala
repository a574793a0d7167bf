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
  * time — peak memory is threshold × row size regardless of cardinality.
  *
  * PARTIAL AGGREGATION (r16, guide §2.3 "aggregate before you shuffle"):
  * the strategy plans a MAP-SIDE heap below the exchange and the final
  * heap above it — exact for any total ordering, because every row of a
  * key's global top-k is in its own partition's top-k (the same argument
  * that makes TakeOrderedAndProject's partial correct).  The exchange then
  * carries at most keys × k rows per map partition instead of every input
  * row — at corpus scale the difference between shuffling the relation
  * and shuffling the sketch.
  *
  * DISTINCT MODE (`distinct = true`): rows that compare EQUAL under
  * `ordering` within a key are collapsed to one — per-key state becomes an
  * ordered set, so the result is the k smallest DISTINCT rows.  Callers
  * must ensure ordering-equality within a key implies row equality (true
  * when the ordering covers every non-key column, the sketch layouts
  * here); this replaces a separate `distinct()` — a full extra
  * shuffle + hash aggregate of the relation — for the KMV-style sketches. */
case class TopKPerKeyPlan(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan,
                          distinct: Boolean = false) extends UnaryNode {
  require(k > 0, s"TopKPerKey: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: logical → partial (map-side) + final heap pair; the
  * final's required distribution makes EnsureRequirements insert the one
  * hash exchange between them (or none when the child is already
  * co-partitioned, where the stacked partial is a no-op pass over ≤ k
  * rows per key). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(g, o, k, child, d) =>
      TopKPerKeyExec(g, o, k,
        TopKPerKeyExec(g, o, k, planLater(child), partial = true, distinct = d),
        partial = false, distinct = d) :: Nil
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
                          k: Int, child: SparkPlan,
                          partial: Boolean = false,
                          distinct: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // the PARTIAL heap runs wherever the rows already are (map side); only
  // the FINAL heap demands key co-location, so EnsureRequirements inserts
  // exactly one hash exchange between the pair
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil
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
    val distinctLocal = distinct
    val spillThreshold =
      conf.getConfString(TopKPerKey.SpillConfKey, "4194304").toLong
    val spillBytes =
      conf.getConfString(TopKPerKey.SpillBytesConfKey, (256L << 20).toString).toLong
    require(spillThreshold >= kLocal,
      s"${TopKPerKey.SpillConfKey} ($spillThreshold) must be >= k ($kLocal)")
    // a partial heap whose input is ALREADY clustered on the keys feeds a
    // final heap directly (EnsureRequirements inserted no exchange) — the
    // map-side pass would buy nothing, so it forwards rows untouched
    if (partial && child.outputPartitioning.satisfies(
        ClusteredDistribution(groupExprs)))
      return child.execute()
    child.execute().mapPartitions { it =>
      new TopKPartitionIterator(it, childOutput, groupLocal, orderLocal,
        kLocal, distinctLocal, spillThreshold, spillBytes)
    }
  }
}

/** Per-partition driver of the heap/spill/merge lifecycle. */
private final class TopKPartitionIterator(
    input: Iterator[InternalRow], childOutput: Seq[Attribute],
    groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, distinct: Boolean,
    spillThreshold: Long, spillBytes: Long) extends Iterator[InternalRow] {

  private val keyProj = UnsafeProjection.create(groupExprs, childOutput)
  private val rowProj = UnsafeProjection.create(childOutput.map(_.asInstanceOf[Expression]), childOutput)
  // best-first total order; the queue's max (head) is the worst retained
  private val rowOrd = RowOrdering.create(ordering, childOutput)
  private val rowOrdUR: Ordering[UnsafeRow] = rowOrd.on[UnsafeRow](identity)

  /** Per-key bounded state: a max-PQ whose head is the worst retained row,
    * or — in DISTINCT mode — an ordered SET under the same ordering, so
    * ordering-equal rows collapse (`add` rejects equals) and the retained
    * set is the k smallest distinct rows. */
  private final class KeyHeap {
    val pq: mutable.PriorityQueue[UnsafeRow] =
      if (distinct) null else mutable.PriorityQueue.empty[UnsafeRow](rowOrdUR)
    val ts: mutable.TreeSet[UnsafeRow] =
      if (distinct) mutable.TreeSet.empty[UnsafeRow](rowOrdUR) else null
    def size: Int = if (distinct) ts.size else pq.size
    /** Retain `cand` if it belongs in the top-k (copying it); returns the
      * retained-BYTES delta (0 = rejected or duplicate).  Row-count delta
      * is observable via [[size]]. */
    def offer(cand: UnsafeRow, copy: Boolean): Long =
      if (distinct) {
        if (ts.size < k) {
          val r = if (copy) cand.copy() else cand
          if (ts.add(r)) r.getSizeInBytes.toLong else 0L
        } else if (rowOrdUR.compare(cand, ts.last) < 0) {
          val r = if (copy) cand.copy() else cand
          if (ts.add(r)) {
            val ev = ts.last
            ts.remove(ev)
            r.getSizeInBytes.toLong - ev.getSizeInBytes
          } else 0L
        } else 0L
      } else {
        if (pq.size < k) {
          val r = if (copy) cand.copy() else cand
          pq.enqueue(r); r.getSizeInBytes.toLong
        } else if (rowOrdUR.compare(cand, pq.head) < 0) {
          val ev = pq.dequeue()
          val r = if (copy) cand.copy() else cand
          pq.enqueue(r)
          r.getSizeInBytes.toLong - ev.getSizeInBytes
        } else 0L
      }
    /** Emission order is best-first either way.  CONSUMES the PQ form. */
    def bestFirst: Iterator[UnsafeRow] =
      if (distinct) ts.iterator else pq.dequeueAll.reverseIterator
  }

  private val heaps = mutable.LinkedHashMap.empty[UnsafeRow, KeyHeap]
  private var retained = 0L
  private var retainedBytes = 0L
  private val spills = mutable.ArrayBuffer.empty[File]
  Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
    spills.foreach(_.delete())
  })

  private def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    val h = heaps.get(key) match {
      case Some(h0) => h0
      case None =>
        val h0 = new KeyHeap
        heaps.put(key.copy(), h0)
        retainedBytes += key.getSizeInBytes
        h0
    }
    val before = h.size
    retainedBytes += h.offer(rowProj(row), copy = true)
    retained += h.size - before
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
      heaps.toArray.map { case (key, h) => (key.getBytes, h) }
        .sortWith((a, b) => cmpBytes(a._1, b._1) < 0)
        .foreach { case (kb, h) =>
          // best-first within the key so merge output needs no re-sort
          h.bestFirst.foreach { (r: UnsafeRow) =>
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
      heaps.iterator.flatMap { case (_, h) => h.bestFirst }
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
          val h = new KeyHeap // distinct mode dedups across runs here too
          live.foreach { r =>
            while (!r.exhausted && cmpBytes(r.keyBytes, minKey) == 0) {
              h.offer(r.row, copy = false) // run rows are fresh buffers
              r.advance()
            }
          }
          pending = h.bestFirst
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

  def apply(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
            distinct: Boolean = false): DataFrame = {
    ensureStrategy(df.sparkSession)
    val child = df.queryExecution.analyzed
    val orders = order.map(GraftSqlBridge.expr).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(k0 => GraftSqlBridge.expr(df(k0))), orders, k,
        child, distinct))
  }
}
