package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Keyed JDBC upsert sink — the reference's persistence contract: the
  * Kafka-Connect JDBC sink upserts every result topic into Postgres with
  * `pk.mode=record_key` (`config/sink-passangers_per_route.json:13-15`,
  * `table.name.format=$${topic}`). Here it is a `foreachBatch` writer:
  * each micro-batch's rows are upserted into the target table on the key
  * columns, inside one transaction per partition.
  *
  * Upsert = DELETE-matching-keys + INSERT per batch partition — portable
  * across JDBC dialects (Derby, the embedded engine used in tests, as well
  * as Postgres); a dialect-specific MERGE/ON CONFLICT is a drop-in
  * replacement. Writes happen on the executors (`foreachPartition`), one
  * connection per partition per trigger, matching how the Connect sink
  * fans out by topic partition.
  */
final class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
                           schema: StructType) extends Serializable {

  private val cols = schema.fieldNames.toSeq
  private val insertSql =
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
  private val deleteSql =
    s"DELETE FROM $table WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"

  /** Create the target table if missing (sink-side auto-create, as the
    * Connect sink's `auto.create=true` does). */
  def ensureTable(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val ddlCols = schema.fields.map { f =>
        val t = f.dataType.typeName match {
          case "string" => "VARCHAR(512)"
          case "long"   => "BIGINT"
          case "integer" => "INT"
          case "double" => "DOUBLE"
          case other => throw new IllegalArgumentException(s"unmapped type $other")
        }
        s"${f.name} $t"
      }.mkString(", ")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($ddlCols)")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () } // exists
      finally st.close()
    } finally conn.close()
  }

  private def upsertPartition(rows: Iterator[Row]): Unit = {
    val conn: Connection = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val del = conn.prepareStatement(deleteSql)
      val ins = conn.prepareStatement(insertSql)
      rows.foreach { r =>
        keyCols.zipWithIndex.foreach { case (k, i) =>
          del.setObject(i + 1, r.getAs[Any](k))
        }
        del.executeUpdate()
        cols.zipWithIndex.foreach { case (c, i) =>
          ins.setObject(i + 1, r.getAs[Any](c))
        }
        ins.executeUpdate()
      }
      conn.commit()
      del.close(); ins.close()
    } finally conn.close()
  }

  /** The foreachBatch body: upsert one micro-batch. */
  def writeBatch(batch: DataFrame, batchId: Long): Unit =
    batch.foreachPartition((it: Iterator[Row]) => upsertPartition(it))
}
