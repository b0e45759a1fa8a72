package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset

/** The two-pass DISTRIBUTED PREFIX SCAN shared by [[Sweep]] (running
  * sum), [[Skyline]] (running max) and [[Rank]] (running count):
  * a global running accumulator over totally-ordered data without a
  * global window (which is one task at any cluster size).
  *
  *   pass A: fold each partition to its total — numPartitions rows —
  *           collect, and prefix-merge on the driver;
  *   pass B: each partition streams once from its broadcast base.
  *
  * The caller must hand in a Dataset that is ALREADY range-partitioned
  * and sorted within partitions in the intended global order, and
  * PINNED (`localCheckpoint`) — `repartitionByRange` samples its
  * bounds, so an unpinned lineage could place rows differently
  * between the two passes.
  *
  * Driver traffic is numPartitions accumulators regardless of data
  * size. `fold` must agree with `merge`:
  * fold(merge(a, b), t) == merge(a, fold(b, t)) — i.e. (A, merge) is
  * a monoid acting on rows from the left.
  */
object PrefixScan {

  /** Scan a pinned, globally-ordered Dataset. Emits one row per input
    * row: `(row, exclusiveAcc, inclusiveAcc)` — the accumulator just
    * before and just after folding the row.
    */
  def scan[T, A: ClassTag](ds: Dataset[T], zero: A)(fold: (A, T) => A)(
      merge: (A, A) => A): RDD[(T, A, A)] = {
    val totals = ds.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var a = zero
        it.foreach(t => a = fold(a, t))
        Iterator.single((pid, a))
      }.collect().sortBy(_._1).map(_._2)
    // bases(pid) = merge of every partition strictly before pid
    val bases = totals.scanLeft(zero)(merge)
    val basesB = ds.sparkSession.sparkContext.broadcast(bases)
    ds.rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var acc = basesB.value(pid)
      it.map { t =>
        val before = acc
        acc = fold(acc, t)
        (t, before, acc)
      }
    }
  }
}
