package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementing-id JDBC source — the reference's reference-data ingest
  * channel (`config/route-suppliers.json:4-14`: Kafka-Connect JDBC source,
  * `mode=incrementing`, `incrementing.column.name=id`, 5 s poll). Spark-first
  * shape: each poll reads only rows with `idCol` above the stored offset,
  * with the predicate pushed down into the remote query, and advances the
  * offset to the max id it saw — exactly the connector's offset protocol.
  *
  * The polled frame is the slowly-changing side of a stream-static join
  * (SURVEY.md §2.3: the `DBInfo-` topic is produced but never consumed by
  * any reference stream; here the snapshot is directly joinable).
  *
  * 100 TB shape: the watermark scalar comes from a 1-row `MAX(id)` probe on
  * the database (an index lookup — never a Spark scan), and the range read
  * fans out over `numPartitions` executor connections via Spark's
  * partitioned JDBC read (`partitionColumn`/bounds), so a large backlog is
  * pulled in parallel instead of through one connection. */
final class JdbcIncrementalSource(url: String, table: String, idCol: String,
                                  numPartitions: Int = 4) {

  /** Exclusive low watermark: everything ≤ this has been delivered. */
  @volatile private var offset: Long = Long.MinValue
  def currentOffset: Long = offset

  /** The connector-style offset probe: min/max of the undelivered id range
    * via plain JDBC, one row (an index-bounds lookup on the database). */
  private def newRange(): Option[(Long, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MIN($idCol), MAX($idCol) FROM $table WHERE $idCol > $offset")
      if (rs.next() && rs.getObject(1) != null) Some((rs.getLong(1), rs.getLong(2)))
      else None
    } finally conn.close()
  }

  /** One incremental poll: rows with `idCol` in (offset, max]; advances the
    * offset. `None` when the table has nothing new. The bounded range is
    * read with a partitioned JDBC scan when it spans more than one id. */
  def poll(spark: SparkSession): Option[DataFrame] = {
    newRange().map { case (mn, mx) =>
      val pred = s"(SELECT * FROM $table WHERE $idCol > $offset AND $idCol <= $mx) t"
      val reader = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", pred)
      val ranged =
        if (mx > mn && numPartitions > 1)
          reader
            .option("partitionColumn", idCol)
            .option("lowerBound", mn.toString)
            .option("upperBound", (mx + 1).toString)
            .option("numPartitions", numPartitions.toString)
        else reader
      offset = mx
      ranged.load()
    }
  }
}
