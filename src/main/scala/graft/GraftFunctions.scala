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

  def functionNames(cfg: PQConfig = PQDefaults.config): Seq[String] =
    cfg.criteria.filterNot(_.protocol == "SPEED")
      .map(c => s"pq_score_${c.protocol.toLowerCase}")

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession, cfg: PQConfig = PQDefaults.config): Unit = {
    cfg.criteria.filterNot(_.protocol == "SPEED").foreach { c =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        s"pq_score_${c.protocol.toLowerCase}",
        builderFor(cfg, c.protocol),
        "built-in")
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
    }
}

/** `spark.sql.extensions`-compatible wiring: injects the pq_score family
  * at session build so every SQL client on the cluster sees them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.injections(PQDefaults.config).foreach(e.injectFunction)
}
