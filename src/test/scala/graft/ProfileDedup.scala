package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dev tool: per-stage warm timings for the dedup hotspots at sf0.1.
  * Run: sbt "Test/runMain graft.ProfileDedup" */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sf = "/root/testdata/sf0.1"
    def docs = Tables.documents(spark, sf)
    // two warm passes, then timed
    (1 to 2).foreach(i => time(s"warm$i minhash")(noop(Dedup.minhashLsh(docs))))

    // per-job breakdown of one warm run
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (Option(js.properties.getProperty("spark.job.description"))
          .getOrElse("?").take(60), js.time))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (d, t0) = starts.getOrDefault(je.jobId, ("?", je.time))
        jobs.put(je.jobId, (d, je.time - t0))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("minhash full")(noop(Dedup.minhashLsh(docs)))
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (d, ms)) =>
      println(f"[prof]   job $id%3d ${ms}%6d ms  $d")
    }
    time("simhash full")(noop(Dedup.simhashDedup(docs)))
    time("ngram full")(noop(Dedup.ngramJaccardBestMatch(docs)))
    time("embedding full")(noop(Similarity.embeddingDedup(spark, sf)))

    // scale sweep: 50 -> 500 -> 5000 docs. Sub-quadratic scaling evidence:
    // wall time should grow far slower than the 100x/10000x a quadratic
    // candidate join would show (band caps + pre-collapse bound the pairs).
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { s =>
      val d = Tables.documents(spark, s"/root/testdata/$s")
      time(s"scale minhash $s")(noop(Dedup.minhashLsh(d)))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
