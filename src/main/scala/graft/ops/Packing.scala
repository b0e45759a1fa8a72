package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — the layout stage of an LLM training pipeline:
  * concatenate variable-length documents into fixed token-budget
  * "packs" (context windows) so padding waste is bounded (Raffel et
  * al., JMLR'20 §2.2 pack-and-trim; Krell et al., arXiv:2107.02027
  * analyze greedy-decreasing packing at corpus scale).
  *
  * Shape for 100 TB: packing is embarrassingly parallel ACROSS packs,
  * so the distributed form is: deterministically shard documents
  * (one shuffle), then run best-fit-decreasing WITHIN each shard via
  * `mapPartitions` — per-task memory is one shard's doc METADATA
  * (id + token count, not text), and pack ids are namespaced by shard
  * so the result is globally unique without coordination. Cross-shard
  * packing would buy ≤ one partially-filled pack per shard in
  * utilization and cost a global sort; BFD within shards of ≥10k docs
  * already packs ≥90% full (same 11/9·OPT+6/9 worst-case bound as
  * FFD, ~8% typical waste at these size distributions). The in-shard
  * packer is O(n log n) — a TreeMap free-space index, not a linear
  * scan over open bins, which would go quadratic at the multi-million
  * doc shard sizes the scaladoc below recommends.
  *
  * Determinism: the shard assignment is a pure function of the id
  * (hash partitioning on `pmod(id, shards)`), the within-shard order
  * is a sort on (token count desc, id), and BFD tie-breaks ties on
  * residual capacity by the smallest bin id — so the same corpus
  * packs identically on any cluster size, which makes training-data
  * lineage auditable.
  */
object Packing {

  /** One packed document slot. `packId` is `"p<shard>_<bin>"`;
    * `slot` is the document's position inside its pack.
    */
  case class Packed(packId: String, docId: Long, nTokens: Long, slot: Int)

  /** Best-fit-decreasing over (id, tokens) pairs — pure, sequential,
    * the unit the distributed path runs per shard. Each doc goes to
    * the open bin with the SMALLEST residual that still fits
    * (TreeMap ceiling lookup, O(log bins); ties on residual break to
    * the smallest bin id). Oversized docs (tokens > budget) get a
    * singleton pack each (the downstream truncation stage's problem,
    * not the packer's).
    */
  def bfd(docs: Iterator[(Long, Long)], budget: Long,
          shard: Int): Iterator[Packed] = {
    val sorted = docs.toArray.sortBy { case (id, n) => (-n, id) }
    val binRoom = scala.collection.mutable.ArrayBuffer.empty[Long]
    val binSlots = scala.collection.mutable.ArrayBuffer.empty[Int]
    // residual capacity -> bin ids at that residual (free-space index)
    val free = new java.util.TreeMap[Long, java.util.TreeSet[Integer]]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Packed]
    sorted.foreach { case (id, n) =>
      val fit = free.ceilingEntry(n)
      val b = if (fit == null) {
        binRoom += budget; binSlots += 0
        binRoom.length - 1
      } else {
        val bins = fit.getValue
        val bb = bins.first()
        bins.remove(bb)
        if (bins.isEmpty) free.remove(fit.getKey)
        bb.intValue()
      }
      binRoom(b) -= math.min(n, budget) // oversize doc fills its singleton bin
      if (binRoom(b) > 0)
        free.computeIfAbsent(binRoom(b), _ => new java.util.TreeSet[Integer]())
          .add(b)
      out += Packed(s"p${shard}_$b", id, n, binSlots(b))
      binSlots(b) += 1
    }
    out.iterator
  }

  /** Distributed BFD packing: `df` must carry an integral id and a
    * token-count column. One shuffle (the shard repartition); packing
    * itself is narrow.
    *
    * @param shards number of independent packing tasks; size it so a
    *               shard's (id, tokens) pairs fit in task memory —
    *               16 bytes/doc, so 10M docs/shard ≈ 160 MB.
    */
  def packGreedy(df: DataFrame, idCol: Column, tokenCol: Column,
                 budget: Long, shards: Int): Dataset[Packed] = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(idCol.cast("long").as("id"),
        tokenCol.cast("long").as("ntok"))
      .repartition(shards, pmod(col("id"), lit(shards.toLong)))
      .as[(Long, Long)]
    pairs.mapPartitions { it =>
      // Shard id must be a pure function of the DATA (partition
      // indexes are scheduler-dependent), and hash partitioning may
      // co-locate several pmod groups in one task — pack each group
      // independently under its own pmod as the shard key, so the
      // result is identical however the groups land on tasks.
      it.toArray.groupBy { case (id, _) => (((id % shards) + shards) % shards).toInt }
        .toSeq.sortBy(_._1)
        .iterator
        .flatMap { case (shard, group) => bfd(group.iterator, budget, shard) }
    }
  }

  /** Materialize pack assignments into actual training sequences:
    * join the (packId, docId, slot) layout back to the document text
    * and concatenate each pack's members in slot order with `sep` —
    * the physical artifact the trainer reads.
    *
    * Scale shape: one equi-join on the doc id (text moves through the
    * shuffle exactly once) and one pack-keyed aggregation;
    * `sort_array(collect_list(struct(slot, ...)))` orders WITHIN each
    * pack — bounded by the pack's member count, never a global sort.
    * Output rows are at most `budget` tokens by construction, so
    * per-group state is capped by the pack budget regardless of
    * corpus size.
    */
  def materialize(packs: Dataset[Packed], texts: DataFrame,
                  idCol: Column, textCol: Column,
                  sep: String = "\n"): DataFrame = {
    val docs = texts.select(idCol.as("__mid"), textCol.as("__mtext"))
    packs.toDF()
      .join(docs, col("docId") === col("__mid"))
      .groupBy(col("packId").as("pack_id"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("nTokens")).as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("slot"), col("__mtext")))),
            e => e.getField("__mtext")),
          sep).as("text"))
  }
}
