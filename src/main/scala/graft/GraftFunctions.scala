package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSessionExtensions}

import graft.score.{PQConfig, PQDefaults, ScoreEngine}
import graft.score.ScoreEngine.Source

/** SQL ergonomics for the scoring engine (SURVEY.md §2.10 U5): per-protocol
  * `pq_score_<protocol>(metric1, metric2, ...)` functions, callable from
  * `spark.sql`. Arguments are positional in criteria metric order (e.g.
  * `pq_score_ping(rtt, lost_rate)`).
  *
  * The registered function is NOT a UDF — the builder splices the caller's
  * argument expressions straight into the compiled score expression tree,
  * so SQL calls get the same codegen'd when-chain as the Column API.
  *
  * Two wirings: [[GraftFunctions.register]] for an existing session, and
  * [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  * at session build (cluster deployment).
  */
object GraftFunctions {

  private def builderFor(cfg: PQConfig, protocol: String)
      : Seq[Expression] => Expression = { exprs =>
    val c = cfg.byProtocol(protocol)
    require(exprs.length == c.metrics.length,
      s"pq_score_${protocol.toLowerCase} takes ${c.metrics.length} arguments " +
        s"(${c.metrics.map(_.name).mkString(", ")})")
    val byName = c.metrics.map(_.name).zip(exprs).toMap
    org.apache.spark.sql.GraftColumnBridge.expression(
      ScoreEngine.scoreFor(c, name =>
        Source(org.apache.spark.sql.GraftColumnBridge.column(byName(name)), name)))
  }

  /** Text/dedup scalar functions exposed to SQL: like pq_score, each call
    * splices the argument expression into the Column-API expression tree
    * (no UDF, full codegen). One entry per single-text-argument function. */
  private[graft] val textFns: Seq[(String, Column => Column)] = {
    import graft.functions.TextFunctions
    Seq(
      "graft_token_count" -> TextFunctions.tokenCount _,
      "graft_bpe_count" -> TextFunctions.bpeTokenEstimate _,
      "graft_stopword_ratio" -> ((c: Column) => TextFunctions.stopwordRatio(c)),
      "graft_punct_ratio" -> TextFunctions.punctRatio _,
      "graft_mean_token_len" -> TextFunctions.meanTokenLen _,
      "graft_quality" -> TextFunctions.qualityScore _,
      "graft_lang_id" -> TextFunctions.langId _,
      "graft_md5key" -> TextFunctions.md5Key60 _,
      "graft_fingerprint" -> TextFunctions.fingerprint _,
      "graft_simhash" -> graft.operators.Dedup.simhash _)
  }

  private def textBuilder(name: String,
      f: Column => Column): Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$name takes 1 argument (text)")
    org.apache.spark.sql.GraftColumnBridge.expression(
      f(org.apache.spark.sql.GraftColumnBridge.column(exprs.head)))
  }

  def functionNames(cfg: PQConfig = PQDefaults.config): Seq[String] =
    cfg.criteria.filterNot(_.protocol == "SPEED")
      .map(c => s"pq_score_${c.protocol.toLowerCase}") ++
      textFns.map(_._1) :+ "rolling_hash"

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession, cfg: PQConfig = PQDefaults.config): Unit = {
    cfg.criteria.filterNot(_.protocol == "SPEED").foreach { c =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        s"pq_score_${c.protocol.toLowerCase}",
        builderFor(cfg, c.protocol),
        "built-in")
    }
    textFns.foreach { case (name, f) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, textBuilder(name, f), "built-in")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => graft.expressions.RollingHash(exprs.head),
      "built-in")
  }

  /** Injection list for [[GraftExtensions]]. */
  private[graft] def injections(cfg: PQConfig)
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    cfg.criteria.filterNot(_.protocol == "SPEED").map { c =>
      val name = s"pq_score_${c.protocol.toLowerCase}"
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name),
        builderFor(cfg, c.protocol))
    } ++ textFns.map { case (name, f) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name),
        textBuilder(name, f))
    } :+ ((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo("graft.GraftFunctions", "rolling_hash"),
      ((exprs: Seq[Expression]) =>
        graft.expressions.RollingHash(exprs.head)): Seq[Expression] => Expression))
}

/** `spark.sql.extensions`-compatible wiring: injects the pq_score family
  * at session build so every SQL client on the cluster sees them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.injections(PQDefaults.config).foreach(e.injectFunction)
}
