package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels of the
  * dedup / similarity operators.
  *
  * Why: Spark's higher-order array functions (`transform`, `aggregate`,
  * `zip_with`) are `CodegenFallback` — evaluated by walking the
  * expression tree per element, allocating intermediate arrays. For a
  * 64-bit SimHash that is 64 branch expressions per token; for a
  * k=32 MinHash it is k full array scans. At 100 TB these kernels
  * dominate the scan cost. Each expression here is one tight JVM loop
  * over the array data with zero allocation (except the output), and
  * generated code calls the same static helper, so whole-stage codegen
  * keeps the rest of the stage fused.
  *
  * Semantics exactly match the declarative forms they replace
  * (engine-portable polynomial hashes — see [[kernels.polyHash]];
  * double accumulation in index order).
  */
object kernels {

  /** Engine-portable rolling hash: h = (h·mult + codepoint) mod P over
    * the string's unicode codepoints in order. Defined by pure 64-bit
    * integer arithmetic, so ANY engine (DuckDB, Trino, a Python
    * checker) recomputes it bit-for-bit — signatures written to a lake
    * stay verifiable outside Spark, and the correctness oracle can
    * hash-match the LSH dedup family instead of trusting spec pins.
    * mult ≤ 131 keeps every step below 2^39 (no overflow, no wrap).
    */
  def polyHash(s: UTF8String, mult: Long): Long = polyHash(s, mult, 0L)

  /** [[polyHash]] over a raw UTF-8 byte array (binary columns).
    * Arbitrary (non-UTF-8) binary must not crash: continuation reads
    * past the end fold as 0 — deterministic, just not text-meaningful.
    */
  def polyHashUtf8Bytes(bytes: Array[Byte], mult: Long, seed: Long): Long = {
    val n = bytes.length
    var h = seed
    var i = 0
    def cont(j: Int): Int = if (j < n) bytes(j) & 0x3f else 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | cont(i + 1); i += 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | (cont(i + 1) << 6) | cont(i + 2); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      h = (h * mult + cp) % P
    }
    h
  }

  /** Seeded variant: starting the fold at a large `seed` makes even a
    * one-character token hash to a full-range value (an unseeded
    * rolling hash maps short strings to SMALL numbers, which zeroes
    * the high bits of every short token's hash — at sf0.1 that
    * concentrated 38% of the corpus into ONE SimHash chunk bucket and
    * quadrupled the candidate join).
    */
  def polyHash(s: UTF8String, mult: Long, seed: Long): Long = {
    // decode codepoints straight from the UTF-8 bytes — toString would
    // allocate a String per token, which tripled the SimHash kernel's
    // cost on the per-row hot path. ASCII is the one-byte fast path.
    // Continuation reads past the end fold as 0 (UTF8String.getByte is
    // an UNCHECKED Unsafe read and Spark does not validate UTF-8 on
    // ingest, so a truncated multi-byte tail from corrupt source data
    // must not read past the buffer — same guard as polyHashUtf8Bytes).
    val n = s.numBytes
    var h = seed
    var i = 0
    def cont(j: Int): Int = if (j < n) s.getByte(j) & 0x3f else 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if (b0 < 0xe0) {
        cp = ((b0 & 0x1f) << 6) | cont(i + 1); i += 2
      } else if (b0 < 0xf0) {
        cp = ((b0 & 0x0f) << 12) | (cont(i + 1) << 6) | cont(i + 2); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      h = (h * mult + cp) % P
    }
    h
  }

  /** SimHash stream seeds (see seeded [[polyHash]]): arbitrary
    * published constants < P, mirrored literally in the DuckDB oracle.
    */
  val SimSeed1 = 1000003L
  val SimSeed2 = 69069L

  /** Single pass SimHash: per-token 62-bit portable hash (two
    * independent seeded [[polyHash]] streams, multipliers 31 and 131,
    * packed as h₁·2³¹ + h₂ — bits 62/63 are always 0), ±1 votes per
    * bit, sign of the vote is the signature bit.
    */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        // both streams in ONE pass over the raw UTF-8 bytes (see
        // polyHash for the codepoint decode; no String allocation)
        val nb = s.numBytes
        var h1 = SimSeed1
        var h2 = SimSeed2
        var ci = 0
        // end-of-buffer guard for truncated multi-byte tails — see
        // polyHash: getByte is unchecked, missing continuations fold as 0
        def cont(j: Int): Int = if (j < nb) s.getByte(j) & 0x3f else 0
        while (ci < nb) {
          val b0 = s.getByte(ci) & 0xff
          var cp = 0
          if (b0 < 0x80) { cp = b0; ci += 1 }
          else if (b0 < 0xe0) {
            cp = ((b0 & 0x1f) << 6) | cont(ci + 1); ci += 2
          } else if (b0 < 0xf0) {
            cp = ((b0 & 0x0f) << 12) | (cont(ci + 1) << 6) | cont(ci + 2); ci += 3
          } else {
            cp = ((b0 & 0x07) << 18) | (cont(ci + 1) << 12) |
              (cont(ci + 2) << 6) | cont(ci + 3); ci += 4
          }
          h1 = (h1 * 31L + cp) % P
          h2 = (h2 * 131L + cp) % P
        }
        val h = (h1 << 31) + h2
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Count regex matches without materializing the match array (the
    * `size(regexp_extract_all(...))` fusion — same match semantics:
    * java.util.regex over the string form, counting full matches).
    */
  def regexpCount(s: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private val P = 2147483647L // 2^31 − 1

  /** MinHash signature: base hash per shingle (portable [[polyHash]]
    * mod P, multiplier 31), k universal permutations (a·h + b mod P)
    * minimized over shingles.
    */
  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = polyHash(s, 31L)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Σ aᵢ·bᵢ, each element cast to double, accumulated in index order
    * (bit-identical to `aggregate(zip_with(...))`).
    */
  def dotDouble(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Dot of a vector column against one pre-normalized centroid row. */
  private def dotRow(v: ArrayData, c: Array[Double], isFloat: Boolean): Double = {
    val n = math.min(v.numElements(), c.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * c(i)
      i += 1
    }
    acc
  }

  /** Argmax over unit-normalized centroids of dot(vec, cᵢ) — equals
    * argmax of cosine because |vec| is constant across candidates.
    * First index wins ties (matches `array_position(scores,
    * array_max(scores))`). One pass per centroid, zero allocation.
    */
  def argmaxCosine(vec: ArrayData, cents: Array[Array[Double]], isFloat: Boolean): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val s = dotRow(vec, cents(i), isFloat)
      if (s > bestScore) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  /** Top-`nProbe` centroid indices by cosine (unit-normalized
    * centroids), descending score, lower index first on ties — the IVF
    * probe list. Selection over a centroid count that is small by
    * construction (≤ a few hundred).
    */
  def probeCells(vec: ArrayData, cents: Array[Array[Double]], isFloat: Boolean,
                 nProbe: Int): ArrayData = {
    val m = cents.length
    val scores = new Array[Double](m)
    var i = 0
    while (i < m) { scores(i) = dotRow(vec, cents(i), isFloat); i += 1 }
    val taken = new Array[Boolean](m)
    val n = math.min(nProbe, m)
    val out = new Array[Int](n)
    var r = 0
    while (r < n) {
      // NaN scores (a NaN in the embedding makes every dot NaN) compare
      // false to everything, which would leave best = -1 and crash the
      // task; rank them last instead of never.
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < m) {
        if (!taken(j)) {
          val sj = scores(j)
          val better =
            if (best < 0) true                      // any untaken cell beats none
            else if (sj.isNaN) false                // NaN never displaces a candidate
            else if (bestScore.isNaN) true          // any real score beats NaN
            else sj > bestScore
          if (better) { bestScore = sj; best = j }
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Flat PQ ADC lookup table: out[j·ks + c] = Σ_p vec[j·sub + p] ·
    * books(j)(c)(p), the per-p sum a left fold in index order — the
    * exact IEEE order of [[graft.ops.Pq]]'s driver-side single-query
    * table and of the SQL oracle's list_sum, so all three are
    * bit-identical. One tight loop replacing an m·ks·sub-operand
    * Column fold whose generated method blew Janino's 64 KB limit and
    * dropped the stage to interpreted mode.
    */
  def pqLut(vec: ArrayData, books: Array[Array[Array[Double]]],
            isFloat: Boolean): ArrayData = {
    val m = books.length
    val ks = books(0).length
    val sub = books(0)(0).length
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val bl = books(j)(c)
        var s = 0.0
        var p = 0
        while (p < sub) {
          val x = if (isFloat) vec.getFloat(j * sub + p).toDouble
                  else vec.getDouble(j * sub + p)
          s += x * bl(p)
          p += 1
        }
        out(j * ks + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Jaccard of two DISTINCT, ASCENDING-SORTED string arrays: one merge
    * pass, no intermediate arrays. Equals
    * `size(array_intersect(a,b)) / size(array_distinct(concat(a,b)))`
    * on distinct inputs.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Intersection count of two DISTINCT, ASCENDING-SORTED string
    * arrays: one merge pass (see [[jaccardSorted]]).
    */
  def interCountSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  /** One-pass word n-gram shingling (see [[Shingles]]). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fixed-point log2 (16 fraction bits) of a positive long — see
    * [[ILog2Fp]] for the algorithm and portability contract. Throws
    * on x ≤ 0 (a count-derived argument that is not positive is
    * upstream corruption; fail loudly, never return a silent wrong
    * logprob — the [[graft.ops.Sharding.assign]] precedent).
    */
  def ilog2fp(x: Long): Long = {
    if (x <= 0L)
      throw new IllegalArgumentException(s"ilog2fp: need x >= 1, got $x")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (bl >= 31) x >>> (bl - 31) else x << (31 - bl)
    var acc: Long = bl - 1
    var i = 0
    while (i < 16) {
      val sq = m * m
      if (sq >= (1L << 61)) { m = sq >>> 31; acc = acc * 2 + 1 }
      else { m = sq >>> 30; acc = acc * 2 }
      i += 1
    }
    acc
  }

  /** DSIR hashed-feature buckets of a token array in ONE pass:
    * unigram buckets for every token, then bigram buckets for every
    * adjacent pair — [n unigrams, n−1 bigrams], the exact layout of
    * `concat(transform(hash uni), transform(hash "w1 w2"))` that it
    * replaces (that form walks interpreted HOF lambdas and allocates
    * a concat string per pair). The pair hash needs NO concatenation:
    * the rolling hash is compositional, so
    * hash(w1 + ' ' + w2) = fold(w2, seed = (fold(w1)·mult + 32) mod P)
    * — bit-identical to hashing the joined string, which keeps the
    * DuckDB oracle's `concat(ts[i], ' ', ts[i+1])` replay valid
    * unchanged. NULL tokens fold as empty strings (the tokenizer
    * never emits them; a corrupt upstream still hashes
    * deterministically).
    */
  def dsirBuckets(arr: ArrayData, mult: Long, seed: Long,
                  buckets: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val raw = new Array[Long](n)
    val out = new Array[Long](n + n - 1)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) seed // polyHash of "" is the seed
        else polyHash(arr.getUTF8String(i), mult, seed)
      raw(i) = h
      out(i) = h % buckets
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val cont = (raw(i) * mult + 32L) % P // ' ' joins the pair
      val h =
        if (arr.isNullAt(i + 1)) cont
        else polyHash(arr.getUTF8String(i + 1), mult, cont)
      out(n + i) = h % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-marker-set occurrence counts over a token array in ONE pass:
    * each token is a single hash probe; a token belonging to several
    * sets increments each. Duplicates count (same semantics as
    * `size(filter(words, isInCollection(set)))` per set — which walks
    * the whole token array once PER SET via CodegenFallback lambdas).
    */
  def markerCounts(arr: ArrayData,
                   lookup: java.util.HashMap[UTF8String, Array[Int]],
                   k: Int): ArrayData = {
    val counts = new Array[Long](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sets = lookup.get(arr.getUTF8String(i))
        if (sets != null) {
          var j = 0
          while (j < sets.length) { counts(sets(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}


/** 64-bit SimHash of an array<string> column (tokens/shingles). */
/** Portable rolling hash of a BINARY column holding UTF-8 bytes —
  * the engine-portable replacement for xxhash64 content fingerprints:
  * any engine recomputes it from the decoded text's codepoints (the
  * DuckDB oracle uses ord() over the source string). Non-UTF-8 binary
  * still hashes deterministically (the decode is just a byte fold
  * then), but cross-engine equality is only meaningful for UTF-8
  * payloads.
  */
case class PolyHashBin(child: Expression, mult: Long, seed: Long)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    kernels.polyHashUtf8Bytes(input.asInstanceOf[Array[Byte]], mult, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.kernels.polyHashUtf8Bytes($c, ${mult}L, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashBin =
    copy(child = newChild)
}

/** Engine-portable fixed-point base-2 logarithm (16 fraction bits) of
  * a positive long — `floor-ish(log2(x) · 2^16)` computed by the
  * classic square-and-shift algorithm in PURE 64-bit integer
  * arithmetic: normalize x to a 31-bit mantissa m ∈ [2^30, 2^31),
  * then 16 rounds of m ← m² >> 30 (>> 31 + emit bit when the square
  * carries past 2^61). Every step is deterministic integer math, so
  * any engine replays it bit-for-bit (the DuckDB oracle folds the
  * same 16 rounds with (m, acc) packed into one BIGINT — acc < 2^23,
  * m < 2^31). Max error vs true log2 is < 2^-14 bits; monotone
  * non-decreasing. The truncating normalization (x >> (bl−31) for
  * x ≥ 2^31) makes counts of ANY magnitude safe — no overflow, no
  * precision cliff, just the same deterministic value on both
  * engines. Differences of these are the logprob currency of the
  * LM-perplexity and DSIR operators ([[graft.ops.Lm]]):
  * log2(a/b) ≈ (ilog2fp(a) − ilog2fp(b)) / 2^16.
  */
case class ILog2Fp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    kernels.ilog2fp(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.ilog2fp($c)")
  override protected def withNewChildInternal(newChild: Expression): ILog2Fp =
    copy(child = newChild)
}

/** [[kernels.dsirBuckets]] as a native expression — the DSIR feature
  * hasher's hot path (one tight loop per document, zero interpreted
  * lambdas, no concat allocation; codegen keeps the stage fused).
  */
case class DsirBuckets(child: Expression, mult: Long, seed: Long,
                       buckets: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    kernels.dsirBuckets(input.asInstanceOf[ArrayData], mult, seed, buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.kernels.dsirBuckets($c, ${mult}L, ${seed}L, ${buckets}L)")
  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    kernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature (array<long> of length k) of an array<string>. */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    kernels.minhashSig(input.asInstanceOf[ArrayData], as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.minhashSig($c, $asRef, $bsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Dot product of two numeric arrays (float or double elements),
  * accumulated in double in index order.
  */
case class DotDouble(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernels.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.kernels.dotDouble($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

/** IVF cell assignment: index of the centroid with max cosine.
  * `cents` must be unit-normalized (the wrapper does this).
  */
case class ArgMaxCosine(child: Expression, cents: Array[Array[Double]])
  extends UnaryExpression {
  require(cents.nonEmpty)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    kernels.argmaxCosine(input.asInstanceOf[ArrayData], cents, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.argmaxCosine($c, $cRef, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxCosine =
    copy(child = newChild)
}

/** IVF probe list: top-nProbe centroid indices by cosine. */
case class ProbeCells(child: Expression, cents: Array[Array[Double]], nProbe: Int)
  extends UnaryExpression {
  require(cents.nonEmpty && nProbe >= 1)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    kernels.probeCells(input.asInstanceOf[ArrayData], cents, isFloat, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.probeCells($c, $cRef, $isFloat, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

/** Flat PQ ADC lookup table over literal codebooks. */
case class PqLut(child: Expression, books: Array[Array[Array[Double]]])
  extends UnaryExpression {
  require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    kernels.pqLut(input.asInstanceOf[ArrayData], books, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.pqLut($c, $bRef, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Merge-pass Jaccard over distinct sorted string arrays. */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.kernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Merge-pass intersection COUNT over distinct sorted string arrays —
  * `size(array_intersect(a, b))` without building the intermediate
  * array or its hash set.
  */
case class InterCountSorted(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernels.interCountSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.kernels.interCountSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): InterCountSorted =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers. */
object ArrayExprs {
  private def unitNorm(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }
  def argmaxCosine(vec: Column, centroids: Array[Array[Double]]): Column =
    Shim.column(ArgMaxCosine(Shim.expression(vec), centroids.map(unitNorm)))
  def probeCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    Shim.column(ProbeCells(Shim.expression(vec), centroids.map(unitNorm), nProbe))
  def pqLut(vec: Column, books: Array[Array[Array[Double]]]): Column =
    Shim.column(PqLut(Shim.expression(vec), books))
  def jaccardSorted(a: Column, b: Column): Column =
    Shim.column(JaccardSorted(Shim.expression(a), Shim.expression(b)))
  def interCountSorted(a: Column, b: Column): Column =
    Shim.column(InterCountSorted(Shim.expression(a), Shim.expression(b)))
  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))
  def polyHashBinary(content: Column, mult: Long = 31L, seed: Long = 0L): Column =
    Shim.column(PolyHashBin(Shim.expression(content), mult, seed))
  def ilog2fp(x: Column): Column =
    Shim.column(ILog2Fp(Shim.expression(x)))
  def dsirBuckets(tokens: Column, mult: Long, seed: Long,
                  buckets: Long): Column =
    Shim.column(DsirBuckets(Shim.expression(tokens), mult, seed, buckets))
  def minhashSig(shingles: Column, as: Array[Long], bs: Array[Long]): Column =
    Shim.column(MinHashSig(Shim.expression(shingles), as, bs))
  def shingles(text: Column, n: Int): Column =
    Shim.column(Shingles(Shim.expression(text), n))
  def dotDouble(a: Column, b: Column): Column =
    Shim.column(DotDouble(
      Shim.expression(a), Shim.expression(b)))
  def markerCounts(words: Column, markerSets: Array[Array[String]]): Column =
    Shim.column(MarkerCounts(Shim.expression(words), markerSets))
}

/** `size(regexp_extract_all(subject, pattern, 0))` fused into one
  * count: no per-match UTF8String allocation, no ArrayData — the
  * token-count / punctuation-ratio / PII-audit hot path. The pattern
  * must be foldable; it is compiled once per plan and shipped as a
  * codegen reference object. `legacyNull` mirrors the `size` it
  * replaces: null subject → -1 under legacy sizeOfNull (the
  * ansi-off default), null otherwise.
  */
case class RegexpCount(left: Expression, right: Expression,
                       legacyNull: Boolean = false)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = !legacyNull && left.nullable
  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      right.eval().asInstanceOf[UTF8String].toString)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) { if (legacyNull) -1 else null }
    else kernels.regexpCount(s.asInstanceOf[UTF8String], compiled)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("pattern", compiled, "java.util.regex.Pattern")
    if (legacyNull) {
      val l = left.genCode(ctx)
      ev.copy(
        code = code"""
          ${l.code}
          int ${ev.value} = ${l.isNull} ? -1 :
            graft.functions.kernels.regexpCount(${l.value}, $ref);""",
        isNull = FalseLiteral)
    } else {
      defineCodeGen(ctx, ev, (c, _) => s"graft.functions.kernels.regexpCount($c, $ref)")
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpCount =
    copy(left = newLeft, right = newRight)
}

/** Per-marker-set token counts (array<long>, one slot per set) of an
  * array<string> column — the language-ID / stopword-ratio kernel.
  */
case class MarkerCounts(child: Expression, markerSets: Array[Array[String]])
  extends UnaryExpression {
  require(markerSets.nonEmpty)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    markerSets.zipWithIndex.foreach { case (set, idx) =>
      set.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }
  override protected def nullSafeEval(input: Any): Any =
    kernels.markerCounts(input.asInstanceOf[ArrayData], lookup, markerSets.length)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("lookup", lookup, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.kernels.markerCounts($c, $mRef, ${markerSets.length})")
  }
  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** Word n-gram shingles of a single-space-tokenized string: one pass,
  * no regex, no intermediate arrays. Short docs (< n tokens) produce a
  * single whole-text shingle. Matches the declarative
  * `transform(sequence(...), slice(split(...)))` form it replaces.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    kernels.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
