package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted IVF+PQ index artifact: codes partitioned by coarse
  * centroid, so a probe restricted to nprobe lists prunes to those
  * directories at planning time — the serving-side layout the ivfPq
  * scale note promises, made concrete. */
class PqCodeTableSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("code table partitions by centroid, prunes probes, and matches the live assignment") {
    val out = Files.createTempDirectory("graft-pqcodes-").toString
    Similarity.writeCodeTable(spark, sf, out)

    val back = spark.read.parquet(out)
    // completeness: every vector carries one code per subspace
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    back.count() shouldBe n * Similarity.PqSubspaces
    back.groupBy("vec_id").count().where(
      col("count") =!= Similarity.PqSubspaces).count() shouldBe 0

    // codes in range; codebook members carry their own id in every subspace
    back.where(col("code") < 0 ||
      col("code") >= Similarity.PqCodebookSize).count() shouldBe 0
    val self = back.where(col("vec_id") < Similarity.PqCodebookSize)
      .where(col("code") =!= col("vec_id").cast("int"))
    self.count() shouldBe 0

    // a probe of two lists prunes to those partition directories
    val probed = back.where(col("cent_id").isin(0, 1))
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
    p should include("PartitionFilters")
    ("cent_id#\\d+ IN \\(0,1\\)".r.findFirstIn(p)
      .orElse("cent_id#\\d+ INSET 0, 1".r.findFirstIn(p))) shouldBe defined
  }
}
