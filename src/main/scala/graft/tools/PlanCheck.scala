package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      val df = graft.queries.Registry.byName(name).run(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.take(110))
      println(s"=== $name")
      joins.foreach(println)
    }
    spark.stop()
  }
}
