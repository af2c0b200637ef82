package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** The reference's JDBC reference-data ingest (`config/route-suppliers.json`:
  * incrementing mode on `id`), end-to-end against embedded Derby: each poll
  * delivers exactly the new rows, the offset advances, and the snapshot
  * joins as the static side of a transit view. */
class JdbcIncrementalSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsrc;create=true"

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); st.executeUpdate(sql); st.close() }
    finally conn.close()
  }

  test("incremental polls deliver each row exactly once, in id order") {
    exec("""CREATE TABLE route_suppliers (
      id BIGINT NOT NULL PRIMARY KEY, route_id VARCHAR(32), supplier VARCHAR(64))""")
    (1 to 3).foreach(i =>
      exec(s"INSERT INTO route_suppliers VALUES ($i, 'r$i', 'Supplier$i')"))

    val src = new JdbcIncrementalSource(url, "route_suppliers", "id")
    val b1 = src.poll(spark)
    b1 should not be empty
    b1.get.collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
    src.currentOffset shouldBe 3L

    // nothing new -> no batch (the connector's empty poll)
    src.poll(spark) shouldBe empty

    (4 to 5).foreach(i =>
      exec(s"INSERT INTO route_suppliers VALUES ($i, 'r$i', 'Supplier$i')"))
    val b2 = src.poll(spark)
    b2.get.collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(4L, 5L)
    src.currentOffset shouldBe 5L
  }

  test("a backlog spanning many ids reads through a partitioned JDBC scan") {
    exec("""CREATE TABLE suppliers_bulk (
      id BIGINT NOT NULL PRIMARY KEY, payload VARCHAR(32))""")
    (1 to 40).foreach(i => exec(s"INSERT INTO suppliers_bulk VALUES ($i, 'p$i')"))
    val src = new JdbcIncrementalSource(url, "suppliers_bulk", "id", numPartitions = 4)
    val b = src.poll(spark).get
    b.rdd.getNumPartitions shouldBe 4 // parallel pull, not one connection
    b.count() shouldBe 40L
  }

  test("the polled snapshot joins as the static side of a transit view") {
    val sp = spark; import sp.implicits._
    exec("""CREATE TABLE route_suppliers2 (
      id BIGINT NOT NULL PRIMARY KEY, route_id VARCHAR(32), supplier VARCHAR(64))""")
    exec("INSERT INTO route_suppliers2 VALUES (1, 'r1', 'SupA')")
    val src = new JdbcIncrementalSource(url, "route_suppliers2", "id")
    val suppliers = src.poll(spark).get.select("route_id", "supplier")
    val trips = Seq(("t1", "r1"), ("t2", "r9")).toDF("trip_id", "route_id")
    val enriched = trips.join(suppliers, Seq("route_id"), "left").collect()
      .map(r => r.getString(1) -> Option(r.getString(2))).toMap
    enriched shouldBe Map("t1" -> Some("SupA"), "t2" -> None)
  }
}
