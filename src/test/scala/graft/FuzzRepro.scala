package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: run one registry query against a fuzz corpus with full
  * stack traces — the debugging face of [[FuzzGen]].
  *
  * Run: sbt "Test/runMain graft.FuzzRepro <sfDir> <query>[,query...]"
  */
object FuzzRepro {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        println(s"[repro] $n rows=${df.count()}")
      } catch { case e: Throwable =>
        println(s"[repro] $n FAILED")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
