package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.nqs.{ProbePipelines, TaskDataPipeline}
import graft.score.{PQConfig, PQDefaults}

/** Structured Streaming harness for the three NQS jobs (SURVEY.md §2.9).
  *
  * Semantics mapping from the reference's Flink topology:
  *  - 10 s tumbling processing-time windows that only BATCH records
  *    (no cross-record aggregation) → micro-batches with
  *    `Trigger.ProcessingTime("10 seconds")` — the faithful equivalent (T1);
  *  - the count-1000 early-fire trigger (T2/U4) → the deterministic
  *    pane state machine [[StatefulOps.countOrTimeFires]], composed into
  *    the task-data topology by [[runTaskDataPaned]] (plus
  *    `maxOffsetsPerTrigger` / `maxFilesPerTrigger` source bounding for
  *    the plain batching path);
  *  - per-record MySQL/Redis side effects (T6) → separate output frames
  *    written in the same `foreachBatch`, transactionally per batch;
  *  - at-least-once + ClickHouse ReplacingMergeTree dedup (T8/O8) →
  *    checkpointed source offsets + content-hash row ids + `dropDuplicates`
  *    at the sink = idempotent replay.
  */
object StreamJobs {

  val DefaultTrigger: Trigger = Trigger.ProcessingTime("10 seconds")

  /** Raw message stream from a directory of text files (one message per
    * line) — the offline stand-in for the Kafka source; swap for
    * `format("kafka")` + `subscribe` in production (S1). */
  def fileSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** Task-data job: every micro-batch runs the full parse→enrich→score
    * pipeline and appends parent + detail-child facts, deduplicated on the
    * content-hash id within the batch (cross-batch dedup is the read-side
    * keep-latest view, as in the reference's ReplacingMergeTree). */
  def runTaskData(raw: DataFrame, dims: TaskDataPipeline.Dims, outDir: String,
      checkpointDir: String, cfg: PQConfig = PQDefaults.config,
      nowEpoch: Long = System.currentTimeMillis() / 1000,
      trigger: Trigger = DefaultTrigger,
      dynConf: Option[graft.core.DynamicConf] = None): StreamingQuery =
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Dynamic config re-resolves at every batch boundary — the Spark
        // analog of the reference's per-record xxl-conf lookups
        // (`TaskDataClickHouseSink.java:71`, `HttpDataParser.java:54`):
        // a changed mirror file takes effect at the next micro-batch, no
        // restart, and a batch is internally consistent (one value per
        // key per batch).
        import graft.core.DynamicConf._
        val skew = dynConf.map(_.getLong(ProbeTimeOffsetKey,
          DefaultProbeTimeOffset)).getOrElse(DefaultProbeTimeOffset)
        val fsf = dynConf.map(_.getDouble(FirstScreenFactorKey,
          DefaultFirstScreenFactor)).getOrElse(DefaultFirstScreenFactor)
        // persist-for-the-batch: the three sinks would otherwise each
        // re-run the whole parse→enrich→derive pipeline. The cache stops
        // BEFORE the 14-protocol score — only the facts sink needs the
        // score, so it's one small projection over the cache scan; fusing
        // it into the cache-build stage overran janino's 64 KB method
        // limit and dropped the whole stage out of whole-stage codegen.
        val pre = TaskDataPipeline.preScore(batch, dims, nowEpoch, fsf, skew)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val details = TaskDataPipeline.explodeHttpDetails(pre, cfg)
          // within-batch dedup on the content-hash id via KeepLatest
          // (duplicate ids are identical rows, so the pick is
          // value-neutral) — NOT dropDuplicates: a first()-aggregate over
          // the ~80-column fact frame generates more code than janino's
          // 64 KB method limit allows, while the row_number window is a
          // stage boundary that keeps every codegen span small. Scoring
          // happens after the dedup for the same reason.
          def dedupById(df: DataFrame): DataFrame =
            graft.operators.KeepLatest(df, Seq("id"),
              Seq(col("create_time").desc))
          // The detail sink runs FIRST: its action materializes the
          // persisted `pre` cache under normal whole-stage codegen, so
          // the parse→enrich→derive build is fully fused. Only then does
          // the facts write flip to OPERATOR-level codegen — WSCG binds
          // input columns to Java locals, which forbids CaseWhen's
          // branch-to-method splitting, so the 14-protocol score CASE can
          // never fit janino's 64 KB method limit there; row-based
          // codegen splits the branches into sub-methods and compiles
          // cleanly. With the cache already hot, the toggle covers
          // exactly the score projection + write. The conf flip is on the
          // stream's OWN session (Structured Streaming clones the session
          // per query, and foreachBatch frames are bound to that clone),
          // and micro-batches of one query never overlap — so the toggle
          // cannot leak to other queries sharing the user's session.
          dedupById(details)
            .write.mode("append").parquet(s"$outDir/gw_http_detail")
          val sess = pre.sparkSession
          val prevWSCG = sess.conf.get("spark.sql.codegen.wholeStage", "true")
          sess.conf.set("spark.sql.codegen.wholeStage", "false")
          try
            TaskDataPipeline.withScore(dedupById(pre.drop("detail")), cfg)
              .write.mode("append").parquet(s"$outDir/gw_facts")
          finally sess.conf.set("spark.sql.codegen.wholeStage", prevWSCG)
          // K6: post-save event branch (the reference pushes saved-record
          // notifications with the alarm template to a Kafka topic —
          // `WindowDataParser.java:174-187`); swap this writer for
          // `format("kafka")` in production.
          pre.select("id", "task_id", "task_param_id", "alarm_template_id",
              "task_type_name", "test_time")
            .dropDuplicates("id")
            .write.mode("append").parquet(s"$outDir/saved_events")
        } finally pre.unpersist()
        ()
      }
      .start()

  /** Task-data job with the reference's count-or-time early-fire
    * batching composed IN the topology (`ConsoleTaskDataMain.java:83`:
    * the custom trigger sits between the parsed stream and the sink):
    * the full parse→clamp→enrich→derive pipeline runs as a streaming
    * transform, feeds [[StatefulOps.countOrTimeFires]] keyed/ordered by
    * caller-supplied columns, and the sink receives PANES — (key,
    * window, fire_seq, count, sum) rows emitted the instant a pane
    * reaches `maxCount` (early) or when the window's event-time timer
    * expires (final flush). Everything upstream of the state machine is
    * stream-safe by construction: projections, per-row HOF detail
    * aggregates, and broadcast stream-static dim joins — no shuffle
    * before the keyed state exchange. `ordinalCol` must be unique per
    * key for replay determinism (the fold order inside a pane). */
  def runTaskDataPaned(raw: DataFrame, dims: TaskDataPipeline.Dims,
      outDir: String, checkpointDir: String, nowEpoch: Long,
      keyCol: org.apache.spark.sql.Column,
      ordinalCol: org.apache.spark.sql.Column,
      xCol: org.apache.spark.sql.Column,
      maxCount: Int, windowSeconds: Long, watermarkDelay: String,
      trigger: Trigger = DefaultTrigger): StreamingQuery = {
    val facts = TaskDataPipeline.preScore(raw, dims, nowEpoch)
    import facts.sparkSession.implicits._
    val evs = facts.select(
        keyCol.cast("string").as("key"),
        col("test_time").cast("long").as("ts"),
        ordinalCol.cast("long").as("ordinal"),
        xCol.cast("long").as("x"),
        col("test_time").cast("timestamp").as("et"))
      .withWatermark("et", watermarkDelay)
      .as[StatefulOps.CotEvent]
    StatefulOps.countOrTimeFires(evs, maxCount, windowSeconds)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .option("path", s"$outDir/paned_facts")
      .trigger(trigger)
      .start()
  }

  /** Heartbeat job: facts + new-probe registrations as two sinks.
    *
    * Register-vs-heartbeat is decided by `StatefulOps.firstSeenRows`
    * UPSTREAM of the sink: the state store remembers which probes ever
    * registered (checkpointed, replay-safe), so a probe registering in
    * batch 1 heartbeats from batch 2 on. The previous design re-read the
    * whole append-only `new_probes` sink every batch — an unbounded
    * per-batch scan over the stream's lifetime (and a blind first-batch
    * catch); the state lookup is O(batch keys) forever. */
  def runHeartbeat(raw: DataFrame, probes: DataFrame, probeAccessType: DataFrame,
      ipRegion: DataFrame, outDir: String, checkpointDir: String,
      nowEpoch: Long = System.currentTimeMillis() / 1000,
      trigger: Trigger = DefaultTrigger): StreamingQuery = {
    val classified = StatefulOps.firstSeenRows(
      ProbePipelines.parseClampHeartbeat(raw, nowEpoch),
      keyCol = "probe_id", ordinalCol = "heartbeat_time")
    classified.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (facts, newProbes) = ProbePipelines.heartbeatJobClassified(
          batch, probes, probeAccessType, ipRegion, nowEpoch)
        // sink through the typed catalog (reference c_p_heartbeat DDL):
        // probe_name/type come from the probe dim with the reference's
        // ValKit defaults (""/0); conform() drops pipeline-internal
        // columns and fails compile-shape drift loudly
        def dimAttr(name: String, t: String): org.apache.spark.sql.Column =
          (if (probes.columns.contains(name)) col(name) else lit(null))
            .cast(t).as(s"__dim_$name")
        val probeAttrs = probes.select(
          Seq(col("id").as("probe_id"), dimAttr("probe_name", "string"),
            dimAttr("type", "long")): _*)
        val heartbeatRows = facts.dropDuplicates("id")
          .join(broadcast(probeAttrs), Seq("probe_id"), "left")
          .withColumn("probe_name", coalesce(col("__dim_probe_name"), lit("")))
          .withColumn("probe_type", lit(null).cast("string"))
          .withColumn("type", coalesce(col("__dim_type"), lit(0L)))
          .withColumn("heartbeat_time_par", to_timestamp(col("heartbeat_time")))
        graft.sources.OutputCatalog.writeConformed(
          heartbeatRows, "c_p_heartbeat", s"$outDir/c_p_heartbeat")
        val regs = newProbes.dropDuplicates("probe_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          regs.write.mode("append").parquet(s"$outDir/new_probes")
          // default-task generation queue (the reference's Redis lpush on
          // registration) as a sink the task generator consumes
          ProbePipelines.defaultTaskNotices(regs)
            .write.mode("append").parquet(s"$outDir/default_task_notices")
        } finally regs.unpersist()
        ()
      }
      .start()
  }

  /** Gateway-info job: five outputs from one parsed stream (T7 side
    * outputs → five filtered branches written per batch). */
  def runGatewayInfo(raw: DataFrame, storedAccessTypes: DataFrame, outDir: String,
      checkpointDir: String, nowEpoch: Long = System.currentTimeMillis() / 1000,
      trigger: Trigger = DefaultTrigger): StreamingQuery =
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val out = ProbePipelines.gatewayInfoJob(batch, storedAccessTypes, nowEpoch)
        // catalog sinks: the pipeline keys time as info_time; the
        // reference tables call it timesheet — rename + derive the
        // Datetime partition column, then conform to the typed schema
        def sink(df: DataFrame, table: String): Unit = {
          val t = df
            .withColumnRenamed("info_time", "timesheet")
            .withColumnRenamed("info_time_h", "timesheet_h")
            .withColumnRenamed("info_time_d", "timesheet_d")
            .withColumnRenamed("info_time_w", "timesheet_w")
            .withColumnRenamed("info_time_m", "timesheet_m")
            .withColumn("timesheet_par", to_timestamp(col("timesheet")))
          graft.sources.OutputCatalog.writeConformed(
            t.dropDuplicates("id"), table, s"$outDir/$table")
        }
        sink(out.pinfo, "c_p_pinfo")
        sink(out.traffic, "c_p_traffic")
        sink(out.status, "c_p_status")
        sink(out.pon, "c_p_pon")
        out.accessDiff.write.mode("append").parquet(s"$outDir/access_diff")
        // probe-dim maintenance (ProbeInfoThread T6 redesign): latest
        // gateway-reported attributes per probe, consumed as dim upserts
        out.probeDimUpdates.write.mode("append").parquet(s"$outDir/probe_dim_updates")
        ()
      }
      .start()

  /** W1: the `c_p_pinfo_real` keep-latest view over an appended fact dir. */
  def latestView(spark: SparkSession, factDir: String, key: String,
      orderCol: String): DataFrame =
    graft.operators.KeepLatest(
      spark.read.parquet(factDir), Seq(key),
      Seq(col(orderCol).desc))

  /** Corpus statistics as a stream: each micro-batch's token stream folds
    * into a count-min sketch written under `sketch/batch=<id>` —
    * overwrite of the batch's OWN directory, so a replayed batch rewrites
    * the identical counters (exactly-once by idempotence, no read-modify-
    * write race on a running total). Readers merge batch sketches by
    * summing counters ([[graft.operators.Sketches]] is algebraic), i.e.
    * the standing "what's frequent in the ingest so far" state. */
  def runTokenSketch(raw: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = DefaultTrigger): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val toks = batch
          .select(from_json(col("value"), schema).as("j"))
          .select(explode(
            graft.functions.TextFunctions.tokens(col("j.text"))).as("tok"))
        graft.operators.Sketches.cmSketch(toks, "tok")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/sketch/batch=$id")
        ()
      }
      .start()
  }

  /** Merge all batch sketches of [[runTokenSketch]] into the corpus-total
    * sketch (sum counters per (j, bucket)). */
  def mergedSketch(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/sketch")
      .groupBy("j", "bucket").agg(sum(col("c")).as("c"))

  /** Distinct-count state as a stream: each micro-batch's HLL register
    * table lands under `hll/batch=<id>` (idempotent overwrite of the
    * batch's own dir, like [[runTokenSketch]]); registers merge at read
    * by MAX — so "distinct users so far" is a query over tiny register
    * tables, never a re-scan of the ingest. */
  def runHllRegisters(raw: DataFrame, groupCol: String, keyCol: String,
      schemaDdl: String, outDir: String, checkpointDir: String,
      trigger: Trigger = DefaultTrigger): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val parsed = batch.select(from_json(col("value"), schema).as("j"))
          .select(col("j.*"))
        graft.operators.Sketches.hllRegisters(parsed, groupCol, keyCol)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/hll/batch=$id")
        ()
      }
      .start()
  }

  /** Max-merged register view of [[runHllRegisters]]' batch outputs. */
  def mergedHll(spark: SparkSession, outDir: String, groupCol: String): DataFrame =
    spark.read.parquet(s"$outDir/hll")
      .groupBy(col(groupCol), col("idx")).agg(max(col("mr")).as("mr"))

  /** Late-data side routing — Flink's allowed-lateness side output in
    * micro-batch form: a row whose event time is older than (the max
    * event time seen in EARLIER batches − `latenessSec`) routes to the
    * `late` sink instead of `main`. The high-watermark is cross-batch
    * state kept as a one-row parquet under the output dir, advanced
    * monotonically AFTER each batch routes (so a batch is judged only
    * against earlier batches — deterministic under staged replay, and
    * the first batch can never be late). Batch outputs land under
    * `batch=<id>` dirs, so replays overwrite idempotently. */
  def runLateRoute(raw: DataFrame, schemaDdl: String, tsCol: String,
      latenessSec: Long, outDir: String, checkpointDir: String,
      trigger: Trigger = DefaultTrigger): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    raw.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val statePath = s"$outDir/_hwm"
        val prevMax: Option[Long] =
          try Some(spark.read.parquet(statePath)
            .agg(max(col("hwm"))).collect()(0).getLong(0))
          catch { case _: Throwable => None }
        val parsed = batch.select(from_json(col("value"), schema).as("j"))
          .select(col("j.*")).persist()
        try {
          val cutoff = prevMax.map(_ - latenessSec)
          val isLate = cutoff
            .map(c => col(tsCol) < lit(c)).getOrElse(lit(false))
          parsed.filter(!isLate).write.mode("overwrite")
            .parquet(s"$outDir/main/batch=$id")
          parsed.filter(isLate).write.mode("overwrite")
            .parquet(s"$outDir/late/batch=$id")
          val batchMax = parsed.agg(max(col(tsCol))).collect()(0)
          val newMax = (if (batchMax.isNullAt(0)) None
            else Some(batchMax.getLong(0))) ++ prevMax
          if (newMax.nonEmpty)
            spark.range(1).select(lit(newMax.max).as("hwm"))
              .coalesce(1).write.mode("overwrite").parquet(statePath)
        } finally parsed.unpersist()
        ()
      }
      .start()
  }
}
