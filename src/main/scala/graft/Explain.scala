package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Plan auditor: prints the formatted physical plan for the given query
  * names (default: headline set) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), broadcast joins, partial aggregation, and
  * WholeStageCodegen spans can be reviewed per query.
  *
  * Usage: runMain graft.Explain [sfDir] [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Registry.all.filter(_.bench).map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try Registry.byName(n).run(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
