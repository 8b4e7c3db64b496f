package graft.core

import org.apache.spark.sql.SparkSession

/** Per-session memoization keyed WEAKLY on the session object — the one
  * pattern four call sites (table loads, query vectors, PQ codebooks,
  * bucketed layouts) previously hand-rolled, now in one place (review
  * r10). Semantics:
  *
  *   - the KEY is the session object itself (never `identityHashCode`: a
  *     GC'd session's reused hash must not serve another session's
  *     artifacts — advice r10);
  *   - the VALUE map lives only as long as its session is strongly
  *     reachable elsewhere. CAVEAT (the trap this class exists to
  *     contain): a WeakHashMap entry whose VALUE strongly references its
  *     KEY is pinned forever. Values that transitively hold the session
  *     (DataFrames — `Dataset.sparkSession`) must go through
  *     [[softGetOrElseUpdate]], which wraps them in a SoftReference: the
  *     GC may clear them under memory pressure (we just rebuild), so a
  *     dead session can always be collected. Plain driver-side values
  *     (Seq[Double], codebooks, table-name tuples) use
  *     [[getOrElseUpdate]] directly.
  */
final class SessionMemo[K, V] {
  private val perSession =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[K, AnyRef]]()

  private def mapFor(s: SparkSession)
      : scala.collection.concurrent.TrieMap[K, AnyRef] =
    perSession.synchronized {
      var t = perSession.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[K, AnyRef]
        perSession.put(s, t)
      }
      t
    }

  /** For values that do NOT reference the session (plain data). */
  def getOrElseUpdate(s: SparkSession, key: K)(build: => V): V =
    mapFor(s).getOrElseUpdate(key, build.asInstanceOf[AnyRef])
      .asInstanceOf[V]

  /** For values that DO reference the session (DataFrames): held via
    * SoftReference so the cache can never pin a dead session — cleared
    * entries rebuild. */
  def softGetOrElseUpdate(s: SparkSession, key: K)(build: => V): V = {
    val m = mapFor(s)
    m.get(key) match {
      case Some(ref: java.lang.ref.SoftReference[_]) =>
        val v = ref.get()
        if (v != null) v.asInstanceOf[V]
        else {
          val built = build
          m.put(key, new java.lang.ref.SoftReference[Any](built))
          built
        }
      case _ =>
        val built = build
        m.put(key, new java.lang.ref.SoftReference[Any](built))
        built
    }
  }
}
