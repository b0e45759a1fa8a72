package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key EWMA (α = 1/2) with BLOCK-BOUNDED state — E19's answer to
  * the one skew hazard the round-12 audit flagged: the previous form
  * collected each key's ENTIRE event history into one aggregation
  * buffer (`collect_list` of (t, id, value) structs), so a power-law
  * key with millions of events became one multi-hundred-MB buffer.
  * Here events fold in `blockEvents`-wide blocks (the
  * [[SuffixArray.ScrubBlockChars]] reassembly discipline): per-block
  * buffers hold ≤ blockEvents structs, blocks compose into
  * `blockBlocks`-wide SUPERBLOCKS by the same affine algebra (one
  * (Σm, fold) summary each), and the per-key combine holds one
  * summary per superblock — a 10⁶-event key is ~244 block summaries
  * in one superblock, and even a 2^48-event key caps the final
  * buffer at `blockBlocks` structs (the r13 audit's last depth gap:
  * the single-level combine was block-bounded, not log-bounded).
  *
  * Semantics (the defined, replayable contract): within a block the
  * fold is the plain sequential `(acc + x) / 2` in (order, id) order
  * (block 0 seeds with its first element — the EWMA convention);
  * blocks then compose IN ORDER as `acc·2^{−m} + c`, where m is the
  * block length and c the block's zero-seeded fold. With exact real
  * arithmetic this IS the unsegmented fold (each step is the affine
  * map acc ↦ acc/2 + x/2, and affine maps compose); in IEEE doubles
  * the composition rounds at block boundaries, so the blocked result
  * can differ from the unsegmented fold in the last ulps — ONE
  * rounding per block replaces the per-element roundings the
  * unsegmented fold would have made with the true prefix value. A
  * bit-exact bounded summary of an IEEE sequential fold does not
  * exist (each step's rounding depends on the full accumulator), so
  * the blocked form is the DEFINITION at scale: deterministic,
  * partition-independent, bit-replayable by the DuckDB oracle at any
  * block count, and EXACTLY the classic fold for every key with
  * ≤ blockEvents events (one block degenerates to the plain fold).
  *
  * The 2^{−m} scale is `pow(2, −m)` — exact for every m ≤ 1074 (a
  * power-of-two result is representable, and both engines' pow is
  * exact there); m ≥ 1075 underflows to exactly 0.0, clamped
  * explicitly so neither engine is asked for a subnormal pow.
  */
object Ewma {

  /** Default block width: ~4k events per buffer, the repo's standard
    * reassembly block granularity.
    */
  val BlockEvents = 4096L

  /** Default SECOND-level width: blocks-of-blocks. The same affine
    * algebra one level up — `blockBlocks` level-1 summaries compose
    * into one (M = Σm, C = zero-seeded fold) superblock summary, so
    * the per-key combine holds ≤ nEvents/(blockEvents·blockBlocks)
    * structs: at the defaults a key needs 2^48 events (≈ 281 T) to
    * put 4096 summaries in the final buffer — the log-bounded form
    * of the r12 fix's linear 1/4096. For any key with ≤
    * blockEvents·blockBlocks events (16.7 M at the defaults) there
    * is ONE superblock and the two-level fold is BIT-IDENTICAL to
    * the single-level contract (the superblock-0 fold IS the old
    * per-key fold), so the shipped oracle replays unchanged.
    */
  val BlockBlocks = 4096L

  private val PowUnderflow = 1075L

  /** (key, n, ewma) per distinct `keyCol`, events ordered by
    * `orderCols` (must be a total order per key for a deterministic
    * answer). `n` is the event count; `ewma` the α=1/2 EWMA under the
    * blocked contract above.
    */
  def ewmaHalf(events: DataFrame, keyCol: Column, orderCols: Seq[Column],
               valueCol: Column, blockEvents: Long = BlockEvents,
               blockBlocks: Long = BlockBlocks): DataFrame = {
    require(blockEvents >= 1, s"blockEvents must be positive, got $blockEvents")
    require(blockBlocks >= 1, s"blockBlocks must be positive, got $blockBlocks")
    val ordNames = orderCols.indices.map(i => s"__o$i")
    val base = events.select(
      keyCol.as("__k") +: valueCol.as("__v") +:
        orderCols.zip(ordNames).map { case (c, n) => c.as(n) }: _*)
    // row_number is a streaming (sort-based, spilling) window — the
    // per-key order is established without any per-key buffer
    val byKey = Window.partitionBy(col("__k"))
      .orderBy(ordNames.map(col): _*)
    val blocks = base
      .withColumn("__rn", row_number().over(byKey).cast("long"))
      .groupBy(col("__k"),
        ((col("__rn") - 1L) / lit(blockEvents)).cast("long").as("__blk"))
      .agg(sort_array(collect_list(struct(col("__rn"), col("__v")))).as("seq"))
      .select(col("__k"), col("__blk"),
        size(col("seq")).cast("long").as("__m"),
        // block 0 seeds null (its first element becomes the acc —
        // the EWMA convention); later blocks fold from 0.0 so their
        // partial composes as acc·2^{−m} + c
        aggregate(col("seq"),
          when(col("__blk") === 0L, lit(null).cast("double"))
            .otherwise(lit(0.0)),
          (acc, x) => when(acc.isNull, x.getField("__v"))
            .otherwise((acc + x.getField("__v")) / lit(2.0))).as("__c"))
    // SECOND composition level: blockBlocks level-1 summaries fold
    // into one superblock (M = Σm, C = the zero-seeded affine fold —
    // superblock 0 seeds null exactly like the old per-key fold, so
    // one-superblock keys are bit-identical to the single-level
    // contract). Buffers at this stage hold ≤ blockBlocks structs.
    val supers = blocks
      .groupBy(col("__k"),
        (col("__blk") / lit(blockBlocks)).cast("long").as("__sb"))
      .agg(sort_array(collect_list(
        struct(col("__blk"), col("__m"), col("__c")))).as("bs"))
      .select(col("__k"), col("__sb"),
        aggregate(col("bs"), lit(0L),
          (acc, b) => acc + b.getField("__m")).as("__M"),
        aggregate(col("bs"),
          when(col("__sb") === 0L, lit(null).cast("double"))
            .otherwise(lit(0.0)),
          (acc, b) => when(acc.isNull, b.getField("__c"))
            .otherwise(acc * scaleOf(b.getField("__m")) +
              b.getField("__c"))).as("__C"))
    supers
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(
          struct(col("__sb"), col("__M"), col("__C")))).as("ss"),
        sum(col("__M")).as("n"))
      .select(col("__k").as("key"), col("n"),
        aggregate(col("ss"), lit(null).cast("double"),
          (acc, s) => when(acc.isNull, s.getField("__C"))
            .otherwise(acc * scaleOf(s.getField("__M")) +
              s.getField("__C"))).as("ewma"))
  }

  /** 2^{−m} with the explicit subnormal clamp. */
  private def scaleOf(m: Column): Column =
    when(m >= PowUnderflow, lit(0.0))
      .otherwise(pow(lit(2.0), -m.cast("double")))

  /** Driver-side replay of the exact blocked contract — the
    * spec-side witness (and the template the generated DuckDB oracle
    * mirrors).
    */
  private[ops] def replay(values: Seq[Double], blockEvents: Int,
                          blockBlocks: Int = Int.MaxValue): Double = {
    val partials = values.grouped(blockEvents).toSeq.zipWithIndex.map {
      case (b, i) =>
        // block 0 seeds with its first element; later blocks fold the
        // zero seed through the same per-element op sequence
        var acc = if (i == 0) b.head else (0.0 + b.head) / 2.0
        b.tail.foreach(x => acc = (acc + x) / 2.0)
        (b.length.toLong, acc)
    }
    def scaleFor(m: Long): Double =
      if (m >= PowUnderflow) 0.0 else math.pow(2.0, -m.toDouble)
    // level 2: superblocks of blockBlocks level-1 summaries; the
    // zero-seeded affine fold, superblock 0 seeding null (first
    // block's partial becomes the acc — the old per-key fold)
    val supers = partials.grouped(blockBlocks).toSeq.zipWithIndex.map {
      case (bs, i) =>
        var acc = if (i == 0) bs.head._2 else {
          val (m0, c0) = bs.head; 0.0 * scaleFor(m0) + c0
        }
        bs.tail.foreach { case (m, c) => acc = acc * scaleFor(m) + c }
        (bs.map(_._1).sum, acc)
    }
    var acc = supers.head._2
    supers.tail.foreach { case (mm, cc) =>
      acc = acc * scaleFor(mm) + cc
    }
    acc
  }
}
