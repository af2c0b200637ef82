package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.StreamAdapters.TopicRef
import graft.streaming.{ResultPublisher, TransitStreamingJob}

/** The production runner — `MainStreamApp.java:12-44` re-expressed: one
  * Spark application subscribing to `Routes_topic`/`Trips_topic`, running
  * all 13 queries continuously, and publishing every result to its
  * `projeto3_*` topic in Connect-envelope form. Transport is the adapter's:
  * Kafka when the connector is deployed, JSON-lines topic directories
  * otherwise.
  *
  * Usage:
  * {{{
  * sbt "runMain graft.MainApp --topics /data/topics \
  *      --checkpoint /data/ckpt --state /data/state --publish-every 10"
  * }}}
  * `--bootstrap host:9092` switches the adapter to Kafka (connector
  * required); `--state` enables durable restart-safe state (optional).
  */
object MainApp {

  final case class Conf(
      topicsDir: Option[String] = None,
      bootstrap: String = "localhost:9092",
      checkpoint: String = "/tmp/graft-ckpt",
      stateDir: Option[String] = None,
      publishEverySec: Long = 10L)

  def parse(args: Array[String]): Conf =
    args.sliding(2, 2).foldLeft(Conf()) {
      case (c, Array("--topics", v))        => c.copy(topicsDir = Some(v))
      case (c, Array("--bootstrap", v))     => c.copy(bootstrap = v)
      case (c, Array("--checkpoint", v))    => c.copy(checkpoint = v)
      case (c, Array("--state", v))         => c.copy(stateDir = Some(v))
      case (c, Array("--publish-every", v)) => c.copy(publishEverySec = v.toLong)
      case (_, other) =>
        throw new IllegalArgumentException(s"unknown arguments: ${other.mkString(" ")}")
    }

  def topicRef(conf: Conf)(topic: String): TopicRef =
    TopicRef(topic, bootstrap = conf.bootstrap, fallbackDir = conf.topicsDir)

  /** Wire the whole app: subscribe → 13 queries → periodic envelope
    * publish. Returns the job, its queries, and one publish step (testable
    * without blocking). */
  def wire(spark: SparkSession, conf: Conf): (TransitStreamingJob, Seq[StreamingQuery], () => Unit) = {
    val ref = topicRef(conf) _
    val job = TransitStreamingJob.fromTopics(
      spark, ref("Routes_topic"), ref("Trips_topic"), conf.stateDir)
    val queries = job.startAll(conf.checkpoint)
    (job, queries, () => ResultPublisher.publishAll(job.store, ref))
  }

  def main(args: Array[String]): Unit = {
    val conf = parse(args)
    val spark = SparkSession.builder()
      .appName("graft-transit") // master comes from spark-submit / default
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, queries, publish) = wire(spark, conf)
    val publisher = new Thread(() => {
      while (queries.exists(_.isActive)) {
        Thread.sleep(conf.publishEverySec * 1000L)
        try publish()
        catch { case e: Throwable => System.err.println(s"[publish] $e") }
      }
    }, "graft-publisher")
    publisher.setDaemon(true)
    publisher.start()
    spark.streams.awaitAnyTermination()
  }
}
