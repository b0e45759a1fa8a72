package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Scale-curve harness: runs the scale-sensitive operator family on
  * synthetically inflated corpora (×1, ×4, ×16) and prints seconds +
  * output rows per factor, plus the fitted power-law exponent
  * log(t_16/t_1)/log 16 — ≈1.0 means the operator's work grows
  * linearly with the corpus, which is the claim the 100 TB design
  * rests on (bucketed candidate generation, never corpus²).
  *
  * Inflation construction: replica r rewrites every token to
  * `tok_r`, so replicas have DISJOINT vocabularies — corpus size
  * multiplies by F while per-token document frequencies, block
  * sizes, and the per-replica answer set stay constant (output
  * scales ×F, work should too). Inflating by plain duplication would
  * instead make every copy a near-dup of every other and grow the
  * TRUE answer quadratically — measuring output volume, not
  * operator efficiency.
  *
  * Usage: runMain graft.tools.ScaleSmoke [sfDir] [maxFactor] [opFilter]
  * (opFilter: comma-separated op names; default all)
  */
object ScaleSmoke {

  private def inflateDocs(docs: DataFrame, f: Int): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("text"),
      explode(sequence(lit(0), lit(f - 1))).as("r"))
      .select(
        (col("doc_id") * f + col("r")).as("doc_id"),
        col("lang"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("r"))), " ").as("text"))

  private def inflateEvents(ev: DataFrame, f: Int): DataFrame =
    ev.select(col("event_id"), col("user_id"), col("value"),
      unix_timestamp(date_trunc("second", col("ts"))).as("t"),
      explode(sequence(lit(0), lit(f - 1))).as("r"))
      .select(
        (col("event_id") * f + col("r")).as("event_id"),
        (col("user_id") * f + col("r")).as("user_id"),
        (col("value") + col("r") * 1e6).as("value"),
        (col("t") + col("r") * 86400L * 40L).as("t"))

  /** Like [[inflateEvents]] but keeps event_type: replicas get
    * disjoint user_ids, so per-user transition sequences (and thus
    * the aggregated graph's edge set) are preserved while transition
    * counts multiply by F — the edge-derivation work grows linearly,
    * the recursion input stays constant-size.
    */
  private def inflateTypedEvents(ev: DataFrame, f: Int): DataFrame =
    ev.select(col("event_id"), col("user_id"), col("event_type"),
      explode(sequence(lit(0), lit(f - 1))).as("r"))
      .select(
        (col("event_id") * f + col("r")).as("event_id"),
        (col("user_id") * f + col("r")).as("user_id"),
        col("event_type"))

  private def time(fn: => DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    val df = fn
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
    }.fold(0L)(_ + _)
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** Cumulative executor spill counters (memory-spilled and
    * disk-spilled bytes across all tasks) — the evidence line for the
    * "spills, never OOMs" claim: a constrained-heap run (see
    * SPARK_DRIVER_MEM) should show completion WITH nonzero spill, not
    * an OOM. Task-end events arrive async; readers settle briefly
    * before snapshotting deltas.
    */
  private val spillMem = new java.util.concurrent.atomic.AtomicLong
  private val spillDisk = new java.util.concurrent.atomic.AtomicLong
  private def trackSpill(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })
  private def spillSnapshot(): (Long, Long) = {
    Thread.sleep(300) // let the listener bus drain
    (spillMem.get(), spillDisk.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxF = args.lift(1).map(_.toInt).getOrElse(16)
    // SPARK_GRAFT_CPUS: constrained-heap runs shrink task concurrency
    // with the heap so per-task memory matches a real executor's
    // (a deployment scales heap WITH cores; 2g/32 threads = 62MB/task
    // models no real cluster)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("SMOKE_COALESCE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val factors = Iterator.iterate(1)(_ * 4).takeWhile(_ <= maxF).toSeq
    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "setsim_join" -> { f =>
        SetSim.jaccardJoin(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), shingleN = 3, tauNum = 7, tauDen = 10)
      },
      "minhash_neardup" -> { f =>
        MinHash.nearDupPairs(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), threshold = 0.7)
      },
      "sparse_sim" -> { f =>
        Tfidf.sharedSalientPairs(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), k = 5, minShared = 2)
      },
      "dup_clusters" -> { f =>
        val d = inflateDocs(Tables.documents(spark, sfDir), f)
        ConnectedComponents.components(
          MinHash.candidatePairs(d, col("doc_id"), col("text")), "id_a", "id_b")
      },
      "global_rank" -> { f =>
        Rank.valueRanks(inflateEvents(Tables.events(spark, sfDir), f),
          col("value"), k = 8)
      },
      "skyline" -> { f =>
        Skyline.frontier(inflateEvents(Tables.events(spark, sfDir), f),
          col("t"), col("value"))
      },
      "cross_neardup" -> { f =>
        // split on the ORIGINAL doc id ((id div f) keeps each
        // replica's even/odd halves intact — raw inflated-id parity
        // would pit disjoint-vocabulary replicas against each other
        // and measure an empty join)
        val d = inflateDocs(Tables.documents(spark, sfDir), f)
        SetSim.crossJaccardJoin(
          d.filter(expr(s"(doc_id div $f) % 2 = 0")),
          d.filter(expr(s"(doc_id div $f) % 2 = 1")),
          col("doc_id"), col("text"), shingleN = 3, tauNum = 7, tauDen = 10)
      },
      "sparse_topk" -> { f =>
        Tfidf.topNeighbors(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), k = 5, minShared = 2, topK = 3)
      },
      "recursive_reach" -> { f =>
        val edges = TransitionGraph.topEdges(
          inflateTypedEvents(Tables.events(spark, sfDir), f),
          col("user_id"), col("event_id"), col("event_type"), k = 3)
        TransitionGraph.reachable(spark, edges, start = "click",
          maxDepth = 4, viewName = s"smoke_edges_x$f")
      },
      "incr_neardup" -> { f =>
        // batch/corpus split on the ORIGINAL id (same rationale as
        // cross_neardup: raw inflated-id modulo would cross replicas)
        val d = inflateDocs(Tables.documents(spark, sfDir), f)
        MinHash.nearDupAgainst(
          d.filter(expr(s"(doc_id div $f) % 10 <> 0")),
          d.filter(expr(s"(doc_id div $f) % 10 = 0")),
          col("doc_id"), col("text"), threshold = 0.3)
      },
      "shard_assign" -> { f =>
        // LPT sort-and-deal (round-7 rework): global prefix-scan index
        // + broadcast stratum lookup — both linear, no global window
        Sharding.assign(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), length(col("text")), nShards = 16, strata = 8)
      },
      "lm_score" -> { f =>
        // bigram-LM scoring under replication: disjoint replica
        // vocabularies multiply the corpus AND the model tables by F
        // (each replica's lang='en' slice trains its own disjoint
        // bigrams), while cross-replica lookups never hit — so the
        // broadcast stays cutoff-bounded per replica and scoring work
        // per document is constant. Output rows = docs ×F exactly.
        Lm.perplexity(inflateDocs(Tables.documents(spark, sfDir), f),
          col("lang") === lit("en"))
      },
      "dsir_weights" -> { f =>
        // DSIR under replication: the bucket table is EXACTLY 8192
        // rows at ANY factor (hashing is the bound, not the vocab) —
        // the flat-broadcast extreme of the model-table family.
        // Output rows = TopK, constant by construction.
        Lm.dsirWeights(inflateDocs(Tables.documents(spark, sfDir), f),
          col("lang") === lit("en"))
      },
      "bpe_train" -> { f =>
        // BPE training under replication: disjoint replica
        // vocabularies (tok_r) multiply BOTH the corpus (the initial
        // word-frequency shuffle — the only corpus-scale pass) and
        // the vocabulary (the per-iteration pair aggregation) by F.
        // The learned merges differ from ×1 (the suffix chars change
        // the pair statistics — expected), but the shape under test
        // is cost: iterations stay vocab-bounded, driver traffic
        // stays nMerges rows, so total time should grow ~linearly.
        // Output rows = nMerges, constant by construction.
        Bpe.train(inflateDocs(Tables.documents(spark, sfDir), f),
          col("text"), nMerges = 16).merges
      },
      "winnow_pairs" -> { f =>
        // winnowed verbatim pair probe under replication: replica
        // token suffixes make vocabularies disjoint, so no ≥32-char
        // run crosses replicas — true pairs replicate per replica
        // (output ~×F while suffix digit lengths agree, the
        // sa_repeats caveat) and the seed join's bucket sizes stay
        // per-replica, never ×F² — the linearity under test
        SubstringDedup.verbatimDupPairs(
          inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), minLen = 32, k = 16)
      },
      "cluster_extend" -> { f =>
        // standing-ClusterIndex maintenance under replication:
        // disjoint replica vocabularies keep pair evidence
        // per-replica (pairs ×F, components ×F, no cross-replica
        // bridges), so the whole loop — candidate derivation, train
        // on the standing slice, fold the batch slice — should grow
        // linearly. The batch/standing split is on the ORIGINAL doc
        // id (the cross_neardup rationale); the fold's own
        // O(batch + touched components) contract is spec-pinned
        // (extendIndex == components(all pairs)) and visible in the
        // bench as q_incr_clusters vs q_dup_clusters: the fold never
        // re-propagates the standing side.
        val d = inflateDocs(Tables.documents(spark, sfDir), f)
        val pairs = MinHash.candidatePairs(d, col("doc_id"), col("text"))
        val batchSide = expr(s"(id_b div $f) % 10 = 0")
        val idx = ConnectedComponents.train(
          pairs.filter(!batchSide), "id_a", "id_b")
        ConnectedComponents.extendIndex(idx, pairs.filter(batchSide),
          "id_a", "id_b").labels
      },
      "sa_repeats" -> { f =>
        // prefix-doubling repeat mining under replication: disjoint
        // replica vocabularies (every token carries the replica
        // suffix) mean no 32-gram can recur across replicas — the
        // leak-free property under test. Members are exactly ×F only
        // while suffixes share a digit length (×4 is exact); replicas
        // ≥ 10 carry a longer suffix, which changes that replica's
        // window geometry and its per-replica answer size — growth
        // stays per-replica-independent, not quadratic. Work =
        // log2(minLen) rounds of window + scan-ranked sorts.
        SuffixArray.repeatGroups(inflateDocs(Tables.documents(spark, sfDir), f),
          col("doc_id"), col("text"), minLen = 32)
      },
      "unigram_tokenize" -> { f =>
        // train + tokenize under replication: disjoint replica
        // vocabularies multiply the distinct-word table (the EM
        // working set) and the corpus by F; per-replica DP work per
        // word is constant, the per-round driver collect stays
        // vocab-bounded, and tokenization is one corpus pass against
        // broadcast word stats. Output rows = docs ×F exactly.
        val d = inflateDocs(Tables.documents(spark, sfDir), f)
        Unigram.tokenCounts(d, col("doc_id"), col("text"),
          Unigram.train(d, col("text")))
      },
      "media_neardup" -> { f =>
        // the Hamming-banded join under replication: XOR-namespace each
        // replica's hashes — Hamming distance is invariant under a
        // shared XOR, so every replica keeps its exact answer set. The
        // per-band mask must be FULL-RANGE scrambled (per-band Knuth
        // multiplies of r): a low-bit mask (r itself) gives every
        // replica pair a SMALL xor delta, and near-miss band values
        // (which concentrate at small deltas on gradient data) then
        // collide across replicas quadratically.
        val hashes = graft.multimodal.PerceptualHash.imageHashes(
          graft.multimodal.Multimodal.realMedia(Tables.documents(spark, sfDir)))
        val mask = Seq(40503L, 2654435761L, 104729L, 899809343L)
          .zipWithIndex.map { case (k, b) =>
            shiftleft(pmod((col("r") + 1) * lit(k), lit(65536L)), 16 * b)
          }.reduce(_ + _)
        val inflated = hashes
          .select(col("media_id"), col("ahash"),
            explode(sequence(lit(0), lit(f - 1))).as("r"))
          .select((col("media_id") * f + col("r")).as("media_id"),
            col("ahash").bitwiseXOR(mask).as("ahash"))
        graft.multimodal.PerceptualHash.hammingPairs(inflated,
          col("media_id"), col("ahash"), maxDist = 2)
      },
      "audio_neardup" -> { f =>
        // the audio energy-hash Hamming join under replication: audio
        // shares hammingPairs with images, so the same XOR-namespace
        // invariance applies (Hamming distance is invariant under a
        // shared XOR; full-range Knuth-scrambled per-band masks keep
        // replicas from colliding). maxDist = 3 matches
        // q_audio_neardup. Output must be exactly ×F of ×1's pairs.
        val hashes = graft.multimodal.PerceptualHash.audioHashes(
          graft.multimodal.Multimodal.realMedia(Tables.documents(spark, sfDir)))
        val mask = Seq(40503L, 2654435761L, 104729L, 899809343L)
          .zipWithIndex.map { case (k, b) =>
            shiftleft(pmod((col("r") + 1) * lit(k), lit(65536L)), 16 * b)
          }.reduce(_ + _)
        val inflated = hashes
          .select(col("media_id"), col("ahash"),
            explode(sequence(lit(0), lit(f - 1))).as("r"))
          .select((col("media_id") * f + col("r")).as("media_id"),
            col("ahash").bitwiseXOR(mask).as("ahash"))
        graft.multimodal.PerceptualHash.hammingPairs(inflated,
          col("media_id"), col("ahash"), maxDist = 3)
      },
      "video_neardup" -> { f =>
        // the shot-overlap inverted-index join under replication: the
        // same XOR-namespace invariance as media_neardup (hash
        // EQUALITY is XOR-invariant, so each replica keeps its exact
        // shared-frame pair set; full-range Knuth-scrambled per-band
        // masks keep replicas from colliding); clip ids shift per
        // replica. Output must be exactly ×F of the ×1 pair count.
        val hashes = graft.multimodal.PerceptualHash.videoFrameHashes(
          graft.multimodal.Multimodal.videoMedia(
            Tables.documents(spark, sfDir)), everyN = 2)
          .select(col("media_id"), col("ahash")).distinct()
        val mask = Seq(40503L, 2654435761L, 104729L, 899809343L)
          .zipWithIndex.map { case (k, b) =>
            shiftleft(pmod((col("r") + 1) * lit(k), lit(65536L)), 16 * b)
          }.reduce(_ + _)
        val inflated = hashes
          .select(col("media_id"), col("ahash"),
            explode(sequence(lit(0), lit(f - 1))).as("r"))
          .select((col("media_id") * f + col("r")).as("media_id"),
            col("ahash").bitwiseXOR(mask).as("ahash"))
        graft.multimodal.PerceptualHash.frameOverlapPairs(inflated,
          minShared = 2)
      },
      "knn_graph" -> { f =>
        // graph build under growth: deterministic synthetic vectors
        // (hash-derived per (id, dim) — fresh data, not replicas:
        // duplicated vectors would share cells and grow pairs
        // quadratically by construction), with the coarse quantizer
        // sized by the DEPLOYMENT rule nCentroids ∝ corpus so the
        // per-cell population — the quadratic term in the candidate
        // count — stays constant. Candidates are then ~n·cellPop·4:
        // expected near-linear time; output is ~k·n rows exactly.
        val n = 500L * f
        val emb = spark.range(n).select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), j -> " +
            "cast(cast(pmod(hash(id, j), 1000) AS double) / 500.0 - 1.0 AS float))")
            .as("embedding"))
        KnnGraph.build(emb, k = 5, nCentroids = 16 * f)
      })

    val opFilter = args.lift(2).map(_.split(",").toSet)
    val selected = ops.filter { case (n, _) => opFilter.forall(_.contains(n)) }
    trackSpill(spark)
    // warm each op once at factor 1 (codegen/JIT), then measure
    println(f"${"op"}%-16s factor  seconds      rows  spillMB   exp(t)")
    val results = selected.map { case (name, build) =>
      time(build(1))
      val times = factors.map { f =>
        val (m0, d0) = spillSnapshot()
        val (sec, rows) = time(build(f))
        val (m1, d1) = spillSnapshot()
        (f, sec, rows, (m1 - m0 + d1 - d0) / (1024 * 1024))
      }
      val (f1, t1, _, _) = times.head
      val (fN, tN, _, _) = times.last
      val exp =
        if (fN > f1 && t1 > 0) math.log(tN / t1) / math.log(fN.toDouble / f1)
        else Double.NaN
      times.foreach { case (f, sec, rows, spillMb) =>
        println(f"$name%-16s x$f%-5d  $sec%7.2f  $rows%8d  $spillMb%7d   ${if (f == fN) f"$exp%.2f" else ""}")
      }
      (name, exp)
    }
    println()
    results.foreach { case (n, e) => println(f"SCALE $n%-16s exponent=$e%.2f") }
    Runtime.getRuntime.halt(0)
  }
}
