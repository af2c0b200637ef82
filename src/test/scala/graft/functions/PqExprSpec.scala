package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native PQ expressions (r18): bit-identical to the interpreted
  * higher-order formulations they replaced — per-subspace squared-L2
  * folds ([[SubspaceSqDists]] vs slice+zip_with+aggregate) and the
  * map-only assignment argmin ([[PqAssign]] vs min_by's (dist asc,
  * code asc) ordering over the exploded pairs). */
class PqExprSpec extends SparkSpec {

  private val SubDim = 8
  private val Dim = 64
  private val K = 16

  private def hofSubDists(v: org.apache.spark.sql.Column,
                          cv: org.apache.spark.sql.Column) =
    array((0 until Dim / SubDim).map { m =>
      aggregate(zip_with(slice(v, m * SubDim + 1, SubDim),
          slice(cv, m * SubDim + 1, SubDim), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
    }: _*)

  test("SubspaceSqDists matches the slice+zip_with+aggregate folds bit-for-bit") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(11)
    val rows = (0 until 150).map { _ =>
      ((0 until Dim).map(_ => rnd.nextDouble() * 2 - 1),
       (0 until Dim).map(_ => rnd.nextDouble() * 2 - 1))
    }
    val out = rows.toDF("v", "cv").select(
      SubspaceSqDists.of(col("v"), col("cv"), SubDim).as("native"),
      hofSubDists(col("v"), col("cv")).as("interp")).collect()
    out.foreach { r =>
      val n = r.getSeq[Double](0); val i = r.getSeq[Double](1)
      n.length shouldBe Dim / SubDim
      n.zip(i).foreach { case (a, b) =>
        java.lang.Double.doubleToLongBits(a) shouldBe
          java.lang.Double.doubleToLongBits(b)
      }
    }
  }

  test("PqAssign matches the exploded min_by argmin (dist asc, code asc) exactly") {
    val sp = spark; import sp.implicits._
    val rnd = new Random(12)
    // coarse integer grid so exact distance TIES genuinely occur and the
    // min-code tiebreak is exercised
    def grid(): Seq[Double] = (0 until Dim).map(_ => rnd.nextInt(3).toDouble)
    val cents = (0 until K).map(c => c -> grid())
    val cf = cents.sortBy(_._1).flatMap(_._2)
    val vecs = (0 until 120).map(i => (i.toLong, grid()))
    val df = vecs.toDF("vec_id", "v").withColumn("cf", typedLit(cf))
    val got = df.select(col("vec_id"),
        PqAssign.of(col("v"), col("cf"), SubDim).as("a"))
      .select(col("vec_id"), col("a.codes").as("codes"), col("a.dists").as("dists"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
    // reference: per (vec, m), argmin over codes by (dist asc, code asc)
    vecs.foreach { case (id, v) =>
      val (codes, dists) = got(id)
      (0 until Dim / SubDim).foreach { m =>
        val byCode = cents.map { case (c, cv) =>
          var s = 0.0
          (0 until SubDim).foreach { i =>
            val d = v(m * SubDim + i) - cv(m * SubDim + i); s += d * d
          }
          (c, s)
        }
        val best = byCode.minBy { case (c, s) => (s, c) }
        codes(m) shouldBe best._1
        java.lang.Double.doubleToLongBits(dists(m)) shouldBe
          java.lang.Double.doubleToLongBits(best._2)
      }
    }
  }
}
