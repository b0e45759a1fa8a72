package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized DataFrame artifacts — the local-mode
  * stand-in for a write-once-read-many table at 100 TB (an inverted
  * index, a decoded hash table): one build per (session, tag, input
  * plan semantics, params), concurrent callers collapse onto the same
  * build via computeIfAbsent, blocks live in MEMORY_AND_DISK via
  * localCheckpoint (spills, never OOMs) for the session's lifetime.
  *
  * Keying rules (each one load-bearing, factored out of
  * [[Tfidf.sharedSalientPairs]] where they were first pinned):
  *  - the key carries the SEMANTIC HASH of the caller-projected input
  *    plan, so two frames that differ (a filtered subset, different
  *    columns, rewritten data) can never alias each other's artifact
  *    even under the same caller-supplied tag;
  *  - the key carries the session UUID, not the session object: a
  *    static map must not pin a stopped session's plan graph;
  *  - two-layer eviction: (a) an ApplicationEnd listener drops the
  *    session's entries even if no artifact op runs again in this JVM
  *    (long-lived test JVMs cycling many sessions); (b) an
  *    opportunistic sweep of entries whose cached frame's context has
  *    stopped, covering sessions hooked before (a) existed — keyed on
  *    the context recorded at memo INSTALL time, so a build that was
  *    in flight or threw when its context died is evicted too, not
  *    just completed ones.
  */
private[graft] object SessionArtifactCache {

  private final case class Key(sessionId: String, tag: String,
                               planHash: Int, params: String)

  /** Memoized build slot: computeIfAbsent installs the (cheap) memo
    * under the map's bin lock, and the actual Spark build then runs
    * under the MEMO's own lazy-val lock — so concurrent builds of
    * different keys never serialize on a shared bin, and a build that
    * transitively re-enters getOrBuild (artifact-on-artifact) can
    * never hit ConcurrentHashMap's recursive-update IllegalState.
    * `completed` exposes the value only once built, so the eviction
    * sweep never forces a build.
    */
  private final class Memo[T](ctx: org.apache.spark.SparkContext,
                              thunk: () => T) {
    @volatile private var built: Option[T] = None
    lazy val value: T = { val v = thunk(); built = Some(v); v }
    def completed: Option[T] = built
    /** True once the installing session's context has stopped —
      * covers builds that never completed (in flight or threw when
      * the context died), which `completed`-based sweeping missed:
      * such a memo would otherwise pin a dead context's thunk
      * forever and rebuild against it on the next same-key hit.
      */
    def stale: Boolean = ctx.isStopped
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Key, Memo[DataFrame]]
  // driver-side value artifacts (trained codebooks, centroid arrays):
  // plain objects, no Spark blocks — evicted with the session's keys
  private val valueCache =
    new java.util.concurrent.ConcurrentHashMap[Key, Memo[AnyRef]]
  // sessions that already carry the eviction listener (by session id)
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // identity-keyed WEAK session-id registry: a GC'd session's entry
  // vanishes with it
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Return the session's artifact for (tag, input-plan semantics,
    * params), building and EAGERLY localCheckpoint-ing it on first
    * request. `projectedInput` must be the caller's SEMANTIC input —
    * projected down to exactly the columns the artifact derives from —
    * so the plan hash distinguishes inputs without false aliasing.
    *
    * `onBuilt` (build path only, after the cache's checkpoint has
    * materialized) receives the RAW built frame — the seam for a
    * builder whose result is itself checkpoint-backed (iterative ops
    * like ConnectedComponents) to drop its inner snapshot, so the
    * session doesn't carry two full copies of the artifact.
    */
  def getOrBuild(projectedInput: DataFrame, tag: String, params: String,
                 onBuilt: DataFrame => Unit = _ => ())
                (build: => DataFrame): DataFrame = {
    val key = makeKey(projectedInput, tag, params)
    cache.entrySet.removeIf(_.getValue.stale)
    valueCache.entrySet.removeIf(_.getValue.stale)
    val ctx = projectedInput.sparkSession.sparkContext
    cache.computeIfAbsent(key,
      _ => new Memo(ctx, () => {
        val raw = build
        val cut = raw.localCheckpoint() // eager: materialized here
        onBuilt(raw)
        cut
      })).value
  }

  /** Like [[getOrBuild]] but for a DRIVER-SIDE value derived from the
    * input (trained codebooks, centroid arrays): computed once per
    * (session, tag, input-plan semantics, params) — the train-once
    * accounting of a persisted index at scale. The value must be a
    * plain object (no Spark resources); it is evicted with the
    * session's keys.
    */
  def getOrCompute[T <: AnyRef](projectedInput: DataFrame, tag: String,
                                params: String)(compute: => T): T = {
    valueCache.entrySet.removeIf(_.getValue.stale)
    valueCache.computeIfAbsent(makeKey(projectedInput, tag, params),
      _ => new Memo[AnyRef](projectedInput.sparkSession.sparkContext,
        () => compute)).value.asInstanceOf[T]
  }

  private def makeKey(projectedInput: DataFrame, tag: String,
                      params: String): Key = {
    val session = projectedInput.sparkSession
    val planHash = projectedInput.queryExecution.analyzed.semanticHash()
    val sid = sessionIds.computeIfAbsent(session,
      _ => java.util.UUID.randomUUID().toString)
    if (evictionHooked.add(sid)) {
      session.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            cache.keySet.removeIf(_.sessionId == sid)
            valueCache.keySet.removeIf(_.sessionId == sid)
            evictionHooked.remove(sid)
          }
        })
    }
    Key(sid, tag, planHash, params)
  }
}
