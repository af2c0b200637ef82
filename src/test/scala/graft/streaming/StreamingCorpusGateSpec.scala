package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkSpec
import graft.operators.Corpus

/** The streaming gate passes exactly what the batch gates pass, and its
  * observe() metrics report the per-batch kept/dropped split. */
class StreamingCorpusGateSpec extends SparkSpec {

  private val stops = Vector("the", "a", "of", "to", "and", "is")
  private val good =
    (1 to 60).flatMap(i => Seq(stops(i % stops.size), s"u$i")).mkString(" ")
  private val loopy = Seq.fill(40)("spam").mkString(" ")
  private val junk = "@@@ ### !!!"

  test("gate keeps quality docs, drops repetitive/low-quality, reports metrics") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    @volatile var lastMetrics: Option[(Long, Long)] = None
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get(StreamingCorpusGate.MetricsName)
        if (m != null) lastMetrics = Some((m.getLong(0), m.getLong(1)))
      }
    }
    sp.streams.addListener(listener)
    val in = MemoryStream[(Long, String)]
    val q = StreamingCorpusGate.gate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      in.addData((1L, good), (2L, loopy), (3L, junk))
      q.processAllAvailable()
      val kept = sp.table("gate_out").collect().map(_.getLong(0)).toSet
      kept shouldBe Set(1L)

      // streaming keep-set == batch clean keep-set on duplicate-free input
      val batchKeep = Corpus.clean(
        Seq((1L, good, "en", "w"), (2L, loopy, "en", "w"), (3L, junk, "en", "w"))
          .toDF("doc_id", "text", "lang", "source"))
        .where("keep").collect().map(_.getLong(0)).toSet
      kept shouldBe batchKeep

      // the observe() metrics saw all three docs and the one survivor
      eventually { lastMetrics shouldBe Some((3L, 1L)) }
    } finally {
      q.stop()
      sp.streams.removeListener(listener)
    }
  }

  /** Listener events are async; poll briefly. */
  private def eventually(assertion: => Unit): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try { assertion; return }
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }
}
