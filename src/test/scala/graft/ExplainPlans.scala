package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the headline queries so
  * plan regressions (lost pushdown, surprise sort, missed broadcast) are
  * visible. Run: sbt "Test/runMain graft.ExplainPlans [names...]" */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q4_occupancy_per_route", "latest_per_key", "sim_cosine_topk",
        "text_token_stats", "q11_window_top_type")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
