package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.kernels

/** Unigram-LM tokenizer (Kudo, ACL 2018 — the SentencePiece model;
  * north-star E3 depth: the OTHER real-world subword tokenizer next to
  * [[Bpe]]), as a hard-EM variant priced entirely in
  * [[graft.functions.kernels.ilog2fp]] fixed-point integer logprobs so
  * that BOTH the trained vocabulary and every segmentation are
  * deterministic, partitioning-independent, and bit-for-bit replayable
  * by the DuckDB oracle (a float EM could never hash-match across
  * engines).
  *
  * Model: pieces p with counts n(p); P(p) = (n(p)+1)/(T+V) add-one
  * smoothed; piece cost = −log2 P in 16.16 fixed point =
  * il(T+V) − il(n(p)+1). A word is segmented by Viterbi DP minimizing
  * the total cost; hard-EM alternates that segmentation (E) with
  * recounting piece usage (M) and pruning to the vocabulary budget.
  *
  * Determinism (the whole point — every choice is a total order):
  *  - seed vocabulary = top-[[SeedSize]] multi-char substrings by
  *    (weighted count desc, piece asc) ∪ ALL single characters;
  *  - Viterbi tie-break = smallest start index among equal-cost
  *    predecessors (the DP scans j ascending and takes the FIRST
  *    strict improvement);
  *  - M-step prune = top multi-char pieces by (count desc, piece asc);
  *    single characters are never pruned (full coverage by
  *    construction — no word can fail to segment).
  *
  * Scale shape (the 100 TB story, identical to [[Bpe]]'s): the ONLY
  * corpus-scale pass is the word-frequency count ([[Bpe.wordFreq]],
  * one map-side-combined shuffle); every EM iteration runs over the
  * DISTINCT-WORD table (a heavy-tailed lexicon — millions of rows at
  * 100 TB, not billions), and the per-iteration driver collect is the
  * vocabulary itself (≤ [[SeedSize]] + alphabet rows, bounded by
  * construction — the same deliberate, bounded driver traffic as
  * Bpe.train's per-merge argmax). Tokenizing a corpus touches it once:
  * explode words, broadcast-join the per-word stats derived from the
  * distinct-word table.
  */
object Unigram {

  /** Longest candidate piece the DP considers. */
  val MaxPieceLen = 5

  /** Viterbi block size: words longer than this segment per
    * [[MaxWordLen]]-char block, independently (a deterministic,
    * replayable contract for degenerate inputs; real words fit in one
    * block).
    */
  val MaxWordLen = 12

  /** Multi-char seed pieces kept (plus all single chars). */
  val SeedSize = 256

  /** Vocabulary budget after each M-step prune: this many multi-char
    * pieces (plus all single chars, never pruned).
    */
  val VocabSize = 64

  /** Hard-EM rounds after seeding. */
  val EmIters = 2

  /** Cost of a piece absent from the vocabulary. Never wins: every
    * position is reachable through single chars at cost ≪ Inf, so the
    * sentinel only pads unreachable arms (and both engines agree on
    * the padded sums exactly — pure integer arithmetic).
    */
  val Inf = 1L << 40

  /** A trained model: `vocab` rows (piece, cnt, cost_fp) with
    * cost_fp = il(T+V) − il(cnt+1) under the FINAL counts.
    */
  final case class UnigramModel(vocab: DataFrame)

  /** Split a word into its independent DP blocks — by CODEPOINTS, not
    * UTF-16 code units: the Spark-SQL `substring`/`length` enumeration
    * in [[blockFreq]] and the DuckDB oracle both count codepoints, so
    * a code-unit split here would carve lone surrogates on non-BMP
    * text and break both the oracle replay and the train/tokenize
    * consistency.
    */
  private[ops] def blocks(word: String): Seq[String] = {
    val cps = word.codePoints.toArray
    cps.grouped(MaxWordLen).map(a => new String(a, 0, a.length)).toSeq
  }

  /** Viterbi-segment one block under `cost` (piece → fixed-point
    * cost). dp[i] = min over j ∈ [i−MaxPieceLen, i−1] of
    * dp[j] + cost(w[j..i)); ties keep the SMALLEST j (scan ascending,
    * strict improvement only). Returns the piece list, left to right.
    * Indexes are CODEPOINTS (see [[blocks]]) — pieces never split a
    * surrogate pair.
    */
  private[ops] def segmentBlock(w: String, cost: Map[String, Long]): Seq[String] = {
    val cps = w.codePoints.toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    def piece(j: Int, i: Int) = new String(cps, j, i - j)
    val dp = Array.fill(n + 1)(Inf * (MaxWordLen + 1))
    val bp = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        val c = dp(j) + cost.getOrElse(piece(j, i), Inf)
        if (c < dp(i)) { dp(i) = c; bp(i) = j }
        j += 1
      }
      i += 1
    }
    // walk back (bp is always set: single chars are always in vocab)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var e = n
    while (e > 0) { val s = bp(e); out += piece(s, e); e = s }
    out.reverse.toSeq
  }

  private def il(x: Long): Long = kernels.ilog2fp(x)

  /** Smoothed fixed-point costs for a count table. */
  private def costsOf(counts: Seq[(String, Long)]): Map[String, Long] = {
    val t = counts.map(_._2).sum
    val v = counts.size.toLong
    counts.map { case (p, c) => p -> (il(t + v) - il(c + 1)) }.toMap
  }

  /** The deduped block table of a (word, freq) lexicon:
    * (w, c = summed freq). Runs over the distinct-word table.
    */
  private def blockFreq(words: DataFrame): DataFrame =
    words.select(col("freq"),
      explode(expr(
        s"transform(sequence(0, (length(word)-1) div $MaxWordLen), " +
          s"k -> substring(word, k*$MaxWordLen+1, $MaxWordLen))")).as("w"))
      .groupBy("w").agg(sum("freq").as("c"))

  /** One E+M round over the deduped block table: segment every block
    * under `cost` (executor-side UDF, broadcast map), recount piece
    * usage weighted by block frequency, collect the bounded count
    * table (≤ previous vocabulary size rows — the deliberate driver
    * collect of this trainer).
    */
  private def emCounts(blk: DataFrame, cost: Map[String, Long]): Seq[(String, Long)] = {
    val seg = udf((w: String) => segmentBlock(w, cost))
    blk.select(col("c"), explode(seg(col("w"))).as("p"))
      .groupBy("p").agg(sum("c").as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Prune a used-count table to [[VocabSize]] multi-char pieces
    * (count desc, piece asc) plus every single char in `chars` (count
    * 0 when unused — never pruned, so coverage survives any prune).
    */
  private def prune(used: Seq[(String, Long)], chars: Seq[String]): Seq[(String, Long)] = {
    val u = used.toMap
    val multis = used.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(VocabSize)
    multis ++ chars.sorted.map(ch => ch -> u.getOrElse(ch, 0L))
  }

  /** Train from a (word, freq) lexicon — the maintained-artifact entry
    * point (fold new batches into the word table with
    * [[Bpe.extendWordFreq]], retrain from the table; the old corpus is
    * never re-read).
    */
  def trainFromWords(words: DataFrame): UnigramModel = {
    val spark = words.sparkSession
    import spark.implicits._
    val blk = blockFreq(words).localCheckpoint(eager = false)

    // seed: weighted substring counts over the block table (bounded:
    // ≤ |blocks|·MaxWordLen·MaxPieceLen candidate rows pre-aggregate)
    val subs = blk.select(col("c"), explode(expr(
      s"flatten(transform(sequence(1, length(w)), j -> " +
        s"transform(sequence(j, least(j + ${MaxPieceLen - 1}, length(w))), " +
        s"i -> substring(w, j, i - j + 1))))")).as("p"))
      .groupBy("p").agg(sum("c").as("s"))
    val chars = subs.filter(length(col("p")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seedMultis = subs.filter(length(col("p")) > 1)
      .orderBy(desc("s"), asc("p")).limit(SeedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    var vocab: Seq[(String, Long)] = seedMultis ++ chars.sortBy(_._1)
    (1 to EmIters).foreach { _ =>
      vocab = prune(emCounts(blk, costsOf(vocab)), chars.map(_._1))
    }
    val t = vocab.map(_._2).sum
    val v = vocab.size.toLong
    UnigramModel(vocab
      .map { case (p, c) => (p, c, il(t + v) - il(c + 1)) }
      .toDF("piece", "cnt", "cost_fp"))
  }

  /** Train over a corpus: one word-frequency pass, then the bounded
    * EM loop.
    */
  def train(docs: DataFrame, textCol: Column): UnigramModel =
    trainFromWords(Bpe.wordFreq(docs, textCol))

  /** [[train]] behind the session artifact cache (the
    * [[Bpe.sharedTrain]] discipline): with `cacheKey` naming the
    * source, the corpus pass + EM loop run once per session and every
    * unigram query (train / tokenize) reuses the vocabulary. Keyed on
    * the projected input plan's semantics plus the training
    * hyper-parameters.
    */
  def sharedTrain(docs: DataFrame, textCol: Column,
                  cacheKey: Option[String] = None): UnigramModel = cacheKey match {
    case None => train(docs, textCol)
    case Some(src) => UnigramModel(SessionArtifactCache.getOrBuild(
      docs.select(textCol), tag = s"unigram_model:$src",
      params = s"w=$MaxWordLen,m=$MaxPieceLen,seed=$SeedSize," +
        s"v=$VocabSize,it=$EmIters") {
      train(docs, textCol).vocab
    })
  }

  /** The tokenizer's ID TABLE — what a pipeline actually ships:
    * every piece gets a stable id by (count desc, piece asc), the
    * same total order the trainer prunes with. The window runs over
    * the VOCABULARY (≤ VocabSize + alphabet rows — bounded by
    * construction, the [[Bpe.tokenIds]] pattern), never the corpus.
    */
  def tokenIds(model: UnigramModel): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    model.vocab.withColumn("token_id",
      (row_number().over(
        Window.orderBy(desc("cnt"), asc("piece"))) - 1).cast("long"))
      .select(col("token_id"), col("piece"), col("cnt"))
  }

  /** PERSIST / load the vocabulary artifact (`path/vocab`) — the
    * tokenizer file a pipeline ships; same discipline as
    * [[Bpe.saveModel]].
    */
  def saveModel(model: UnigramModel, path: String): Unit =
    model.vocab.write.mode("overwrite").parquet(s"$path/vocab")
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): UnigramModel =
    UnigramModel(spark.read.parquet(s"$path/vocab"))

  /** Tokenize a corpus under a trained model: Viterbi-segment the
    * DISTINCT words (bounded table; executor UDF over the broadcast
    * ≤ VocabSize+alphabet cost map), then touch the corpus exactly
    * once — explode words, broadcast-join the per-word stats,
    * aggregate. Output: (doc_id, n_words, n_pieces, nll_fp).
    */
  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column,
                  model: UnigramModel): DataFrame = {
    val cost = model.vocab.collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    // plain Tuple2 return (a nested case class would trip the known
    // Janino struct-accessor rejection and fall back to interpreted).
    // Pieces outside the vocabulary (possible only for CHARACTERS the
    // training corpus never saw — the streaming-OOV case) price at
    // [[Inf]], the <unk>-penalty contract of a shipped tokenizer.
    val seg = udf { (w: String) =>
      val ps = blocks(w).flatMap(b => segmentBlock(b, cost))
      (ps.length.toLong, ps.map(cost.getOrElse(_, Inf)).sum)
    }
    val words = docs.select(explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .withColumn("st", seg(col("word")))
      .select(col("word"), col("st._1").as("n_pieces"),
        col("st._2").as("nll_fp"))
    docs.select(idCol.as("doc_id"), explode(split(textCol, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(words), Seq("word"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("nll_fp").as("nll_fp"))
  }
}
