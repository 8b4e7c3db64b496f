package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SafeMath

/** Spectral statistics over an embedding column — the "what direction does
  * this corpus point in" family: top principal direction of the uncentered
  * second-moment matrix via fixed-round power iteration, and the per-vector
  * projection onto it (the 1-D "semantic axis" used for corpus drift plots,
  * anisotropy audits, and whitening decisions before ANN indexing).
  *
  * Everything is deterministic and hash-gateable by the same discipline as
  * the Lloyd machinery ([[Similarity.kmeans]]): the corpus-sized work is ONE
  * scan producing exact integer moment sums; the d×d iteration runs on the
  * driver (d² doubles of state) with mirrored IEEE arithmetic so a DuckDB
  * oracle replays every round bit-for-bit.
  *
  * Scale shape: the moment matrix is ONE custom aggregate
  * ([[graft.expressions.MomentSumAgg]]) — each row folds its d·(d+1)/2
  * upper-triangle products (the standard outer-product cost of
  * covariance) into a per-task long[] with BigInteger overflow banking,
  * so the shuffle carries one serialized buffer per task and only d²/2
  * exact totals reach the driver. The power iteration and normalization
  * touch no corpus data; the final projection is one codegen'd
  * [[graft.expressions.ArrayDot]] scan.
  */
object Spectral {

  /** Exact upper-triangle second-moment sums: (i, j, s) with i <= j,
    * s = Σ_rows round(x_i·x_j·10^snap) as DECIMAL(38,0) — exact at any
    * corpus size; callers convert to doubles under an explicit 2⁵³ bound.
    */
  /** The moment-scan plan over a raw (vecCol) frame — exposed for the
    * plan book (the driver-side collect in [[pc1Component]] hides it
    * from a gate's final executed plan). */
  private[graft] def momentPlan(embeddings: DataFrame, vecCol: String,
      dim: Int, snap: Int = 9): DataFrame =
    momentSums(
      embeddings.select(col(vecCol).cast("array<double>").as("__v")),
      dim, snap)

  private def momentSums(e: DataFrame, dim: Int, snap: Int): DataFrame = {
    // ONE custom aggregate instead of a d²/2-per-row generator fan-out:
    // graft.expressions.MomentSumAgg folds each vector's upper-triangle
    // products into a long[] per task (BigInteger-banked on overflow, so
    // exact at any scale) — the generator form paid a 2080× row fan-out
    // through generate + hash-update + Decimal-sum per fanned row
    // (~7 CPU-s at sf0.1; 2×10¹² hash updates at a 10⁹-row corpus).
    // spread first: the per-row d²/2 loop is CPU-dense and otherwise
    // runs at the file's split count (the q229 lesson; no-op when splits
    // ≥ cores, as any real corpus read has).
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = (for { i <- 0 until dim; j <- i until dim } yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
    Similarity.spread(e)
      .agg(graft.expressions.MomentSumAgg.moment_sums(col("__v"), dim, snap)
        .as("__s"))
      .select(posexplode(col("__s")).as(Seq("__k", "s")))
      // the k → (i, j) map is a broadcast of d·(d+1)/2 rows, never a
      // giant literal array (the janino method-limit trap)
      .join(broadcast(pairs.toDF("__k", "i", "j")), Seq("__k"))
      .select(col("i"), col("j"), col("s"))
  }

  /** Top principal direction of the uncentered second-moment matrix,
    * `iters` rounds of power iteration from the all-ones vector with
    * ∞-norm normalization (no sqrt — division by the max-|component| is
    * a single IEEE op both engines reproduce; components are snapped to
    * scale 6 per round so the iteration state is exactly replayable).
    * Uncentered on purpose: for embedding corpora the mean is part of the
    * signal (anisotropy audits measure it), and centering would make the
    * moment sums inexact. Sign convention: whatever the iteration
    * converges to from the all-ones start — deterministic, not canonical.
    */
  def pc1Component(embeddings: DataFrame, vecCol: String, dim: Int,
      iters: Int = 4, snap: Int = 9): IndexedSeq[Double] = {
    require(dim >= 1 && iters >= 1)
    val e = embeddings
      .select(col(vecCol).cast("array<double>").as("__v"))
    // ≤ dim² moment rows to the driver — bounded by construction
    componentFromMoments(momentSums(e, dim, snap).collect(), dim, iters, snap)
  }

  /** Driver-side conversion of exact moment rows (i, j, s) into the
    * iterated component — shared by the batch and stream paths. */
  private def componentFromMoments(
      rows: Array[org.apache.spark.sql.Row], dim: Int, iters: Int,
      snap: Int): IndexedSeq[Double] = {
    val lim = java.math.BigDecimal.valueOf(1L << 53)
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val s = r.getDecimal(2)
      require(s.abs.compareTo(lim) < 0,
        s"pc1Component: moment sum ${s} exceeds 2^53 at snap=$snap — " +
          "lower `snap` so per-row products stay exactly summable")
      val v = s.longValueExact().toDouble / math.pow(10, snap)
      m(r.getInt(0))(r.getInt(1)) = v
      m(r.getInt(1))(r.getInt(0)) = v
    }
    iterate(m, dim, iters)
  }

  /** Streamed maintenance of the moment state: one micro-batch's exact
    * (i, j, s) sums written under `__batch=id` via dynamic partition
    * overwrite — a REPLAYED batch rewrites exactly its own partition
    * (the AnnIndex idempotency recipe; moment sums are additive, so
    * anything less would double-count). */
  def appendMomentsBatch(batch: DataFrame, statePath: String,
      vecCol: String, dim: Int, batchId: Long, snap: Int = 9): Unit = {
    val e = batch.select(col(vecCol).cast("array<double>").as("__v"))
    momentSums(e, dim, snap)
      .withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(statePath)
  }

  /** The component from a stream-maintained moment state: re-sum across
    * batch partitions (exact DECIMAL adds), then the same driver
    * iteration as the batch path — a stream that saw the whole corpus
    * yields the identical component. */
  def pc1FromMomentState(spark: org.apache.spark.sql.SparkSession,
      statePath: String, dim: Int, iters: Int = 4,
      snap: Int = 9): IndexedSeq[Double] = {
    val rows = spark.read.parquet(statePath)
      .groupBy("i", "j").agg(sum(col("s")).as("s"))
      .collect() // ≤ dim² moment rows — bounded by construction
    componentFromMoments(rows, dim, iters, snap)
  }

  /** The driver-side iteration — mirrored 1:1 by the generated oracle SQL
    * (left folds, (m·v) then max-abs then `floor(x·10⁶+0.5)/10⁶`). */
  private def iterate(m: Array[Array[Double]], dim: Int,
      iters: Int): IndexedSeq[Double] = {
    var v = IndexedSeq.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val w = (0 until dim).map { i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j))
      }
      val s = w.foldLeft(0.0)((a, x) => if (math.abs(x) > a) math.abs(x) else a)
      if (s != 0.0) v = w.map(x => SafeMath.roundHalfUpD(x / s, 6))
    }
    v
  }

  /** Per-vector projection onto [[pc1Component]]: (idCol, pc1) rounded to
    * `scale`. One moment scan + one codegen'd dot-product scan. */
  def pc1Projection(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int = 4, snap: Int = 9, scale: Int = 6): DataFrame = {
    val comp = pc1Component(embeddings, vecCol, dim, iters, snap)
    embeddings.select(col(idCol),
      SafeMath.roundHalfUp(
        // ArrayDot folds toDouble(elem) itself — the raw float column
        // feeds it directly, no per-element cast projection
        Similarity.dotLit(col(vecCol), comp),
        scale).as("pc1"))
  }

  /** Deterministic Johnson–Lindenstrauss random projection to `outDim`
    * dimensions: projection matrix entries are ±1 from the same splitmix
    * bit recipe as [[Similarity.plane]] (seeded, data-independent), scaled
    * by 1/outDim at the end. The workhorse "shrink 4096-dim embeddings to
    * 64 before LSH/IVF" step — one codegen'd dot per output component,
    * no shuffle at all. Output: (idCol, proj: array<double> rounded). */
  def randomProject(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, seed: Int = 7, scale: Int = 6): DataFrame = {
    // ONE reference-object node (graft.expressions.PlaneProject) — the
    // former array-of-rounded-dots spelled outDim×dim literal nodes the
    // driver re-analyzed/compiled per action (q241 8.2 s at sf1, all
    // driver; the q221/q310 compile class); bit-for-bit the same folds,
    // LONG-floor rounding, and null-component contract
    embeddings.select(col(idCol),
      graft.expressions.PlaneProject.plane_project(col(vecCol),
        (0 until outDim).map(b => Similarity.plane(seed, b, dim)),
        outDim.toDouble, scale).as("proj"))
  }
}
