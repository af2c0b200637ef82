package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: print the executed adaptive plan of the skew-exposed
  * event-grain join so the SkewBench marker grep matches reality. */
object SkewDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

    val events = spark.read.parquet("/tmp/graft_skew/events.parquet")
    val userDim = events.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
      .localCheckpoint(true)
    val df = events.join(userDim, "user_id")
      .groupBy("segment").agg(count(lit(1)).as("n"), sum("value").as("sv"),
        max("props").as("mp"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("=== PLAN START ===")
    println(plan.take(6000))
    println("=== PLAN END ===")
    spark.stop()
  }
}
