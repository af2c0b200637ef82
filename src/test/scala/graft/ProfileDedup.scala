package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dev tool: per-stage warm timings for the dedup hotspots at sf0.1.
  * Run: sbt "Test/runMain graft.ProfileDedup" */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(sys.env.getOrElse("PROF_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROF_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.buffer.pageSize", sys.env.getOrElse("PROF_PAGE", "64m"))
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

    if (args.contains("counts")) {
      import org.apache.spark.sql.functions._
      val d = Tables.spread(docs)
      val shas = d.select(col("doc_id"), md5(col("text").cast("binary")).as("sha"))
      val repid = shas.groupBy("sha").agg(min("doc_id").as("rep"))
      println(s"[prof] docs=${d.count()} reps=${repid.count()}")
      val reps = d.join(repid.select(col("rep").as("doc_id")), "doc_id")
        .select(col("doc_id"), col("text"))
      val withSig = reps
        .select(col("doc_id"), Dedup.hashedShingles(col("text")).as("sh"))
        .withColumn("sig", graft.functions.MinHashSignatures.of(col("sh")))
        .localCheckpoint(true)
      println(withSig.select(avg(size(col("sh")))).collect().mkString("[prof] avg shingles: ", "", ""))
      val bands = withSig
        .select(col("doc_id"), posexplode(Dedup.bandKeys(col("sig"))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
      val bstats = bands.groupBy("band", "bkey").agg(count(lit(1)).as("bsz"))
      println("[prof] bucket-size histogram:")
      bstats.groupBy("bsz").agg(count(lit(1)).as("n")).orderBy(desc("bsz")).show(10)
      val ok = bstats.where(col("bsz").between(2, Dedup.MaxBandBucket)).select("band", "bkey")
      val in2 = bands.join(ok, Seq("band", "bkey"))
      val cand = in2.select(col("band"), col("bkey"), col("doc_id").as("a"))
        .join(in2.select(col("band"), col("bkey"), col("doc_id").as("b")),
          Seq("band", "bkey"))
        .where(col("a") < col("b"))
        .select("a", "b").distinct()
      println(s"[prof] cand pairs=${cand.count()}")
      spark.stop(); return
    }
    // two warm passes, then timed
    (1 to 2).foreach(i => time(s"warm$i minhash")(noop(Dedup.minhashLsh(docs))))

    // per-job breakdown of one warm run (job name = its last stage's
    // callsite, which names the action/checkpoint that triggered it)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.stageInfos.lastOption.map(si =>
          si.name.take(90) + " nstages=" + js.stageInfos.size)
          .getOrElse("?"), js.time))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (d, t0) = starts.getOrDefault(je.jobId, ("?", je.time))
        jobs.put(je.jobId, (d, je.time - t0))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        if (wall > 100)
          stages.add(f"stage ${si.stageId}%3d wall=${wall}%5d ms " +
            f"exec=${si.taskMetrics.executorRunTime}%6d ms " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1000000}%6d ms " +
            f"deser=${si.taskMetrics.executorDeserializeTime}%6d ms " +
            f"gc=${si.taskMetrics.jvmGCTime}%5d ms " +
            f"tasks=${si.numTasks}%3d  rdds=" +
            si.rddInfos.map(_.name).mkString("<", "|", ">").take(160))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("minhash full")(noop(Dedup.minhashLsh(docs)))
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (d, ms)) =>
      println(f"[prof]   job $id%3d ${ms}%6d ms  $d")
    }
    stages.asScala.foreach(s => println(s"[prof]   $s"))
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
