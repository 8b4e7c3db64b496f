package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Runtime-reloadable key/value config — the Spark-idiomatic analog of the
  * reference's xxl-conf client (`nqs-common/.../XxlConfBean.java`: remote
  * admin center → client cache → local mirror file). Here the mirror FILE
  * is the source of truth — a `java.util.Properties`-format file on
  * shared/driver-visible storage, polled with a TTL — because a
  * config-center RPC is an environment concern, not an engine one; on a
  * cluster the same file sits on NFS/object storage, or [[refresh]] is
  * called from whatever watcher the deployment runs.
  *
  * Consumption model: values are read ON THE DRIVER at plan-build time
  * and enter plans as literals. Streaming jobs that rebuild their plan
  * every micro-batch (`foreachBatch` — all of [[graft.streaming
  * .StreamJobs]]) therefore pick up changes at the next batch boundary
  * with no restart, which is exactly the no-redeploy contract xxl-conf
  * gives the reference's Flink jobs (`TaskDataClickHouseSink.java:71`
  * re-resolves `gw-console.probe.time.offset` per record; per micro-batch
  * is the batch-granular equivalent, and batch-consistent to boot — one
  * batch never sees two values of the same key).
  *
  * Reload semantics: the first load must succeed ([[get]] on a missing
  * file throws — a misconfigured job should fail fast, not run forever on
  * silent defaults); later refresh failures KEEP the last good snapshot,
  * mirroring xxl-conf's mirror-file fallback when the admin center is
  * unreachable. Thread-safe; driver-side only (never shipped to
  * executors).
  */
final class DynamicConf(path: String, ttlMs: Long = 30000L) {

  @volatile private var snapshot: Option[Map[String, String]] = None
  @volatile private var loadedAt = Long.MinValue

  /** Force a re-read of the mirror file. Throws only if NO load has ever
    * succeeded; afterwards a vanished/corrupt file keeps the last-good
    * snapshot (the xxl-conf mirror fallback). */
  def refresh(): Unit = synchronized {
    try {
      val p = new java.util.Properties()
      val in = Files.newInputStream(Paths.get(path))
      try p.load(new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
      finally in.close()
      val m = Map.newBuilder[String, String]
      p.stringPropertyNames().forEach(k => m += k -> p.getProperty(k))
      snapshot = Some(m.result())
      loadedAt = System.currentTimeMillis()
    } catch {
      case _: java.io.IOException if snapshot.isDefined =>
        loadedAt = System.currentTimeMillis() // back off for a TTL, keep last-good
    }
  }

  /** Current snapshot, re-reading the mirror file when the TTL has
    * elapsed. `ttlMs = 0` re-reads on every call (test mode / external
    * watcher driving [[refresh]] itself). */
  def current(): Map[String, String] = {
    if (snapshot.isEmpty || System.currentTimeMillis() - loadedAt >= ttlMs)
      refresh()
    snapshot.getOrElse(
      throw new java.io.FileNotFoundException(
        s"DynamicConf mirror file never loaded: $path"))
  }

  def get(key: String): Option[String] = current().get(key)

  def getString(key: String, default: String): String =
    get(key).getOrElse(default)

  /** `XxlConfBean.getXxlValueByLong` analog. */
  def getLong(key: String, default: Long): Long =
    get(key).map(_.trim.toLong).getOrElse(default)

  /** `XxlConfBean.getXxlValueByDouble` analog. */
  def getDouble(key: String, default: Double): Double =
    get(key).map(_.trim.toDouble).getOrElse(default)
}

object DynamicConf {

  /** The reference's dynamic keys (grep `getXxlValueBy*` in the
    * reference): the probe clock-skew gate and the HTTP first-screen
    * weighting. */
  val ProbeTimeOffsetKey = "gw-console.probe.time.offset"
  val FirstScreenFactorKey = "gw-console.data.http.firstscreencost"

  val DefaultProbeTimeOffset = 108000L
  val DefaultFirstScreenFactor = 1.0

  /** Write a mirror file atomically (temp + move) so a concurrently
    * polling reader never observes a torn write. */
  def writeMirror(path: String, values: Map[String, String]): Unit = {
    val p = new java.util.Properties()
    values.foreach { case (k, v) => p.setProperty(k, v) }
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      if (target.getParent != null) target.getParent else Paths.get("."),
      ".conf", ".tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8), null)
    finally out.close()
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
