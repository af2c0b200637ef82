package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label) — training-data-pipeline extension surface
  * (BASELINE.json north star; no counterpart in the reference).
  *
  * Two paths:
  *   - [[cosineTopK]]: exact brute-force top-k — the correctness baseline.
  *     The query side is tiny (fixed id set) and broadcast; the big side
  *     streams through one pass. O(Q·N) work but no shuffle of the corpus.
  *   - [[annLshTopK]]: the 100 TB scale path — random-hyperplane (sign) LSH
  *     with banded multi-probe: candidates only where a query and a corpus
  *     vector share a signature band, then exact cosine on candidates.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions over
  * array<double> — no UDFs. (Higher-order expressions are CodegenFallback
  * in Spark, but evaluate as single-pass array folds; the joins and
  * aggregations around them are fully codegen'd.)
  */
object Similarity {

  val TopK = 5
  val NumQueryVectors = 10
  val SignatureBits = 32
  val BandsPerSignature = 8 // 8 bands x 4 bits: multi-probe for recall

  /** Sequential-fold dot product (matches DuckDB list_dot_product order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Exact brute-force cosine top-k: the first [[NumQueryVectors]] vec_ids
    * are the query set; rank all others by cosine similarity. Output one row
    * per (query, rank<=k): (query_id, neighbor_id, rank, cosine_sim). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val vs = vectors(spark, sfDir)
    val queries = vs.where(col("vec_id") < NumQueryVectors)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = vs.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine_sim"))
    topKPerQuery(scored)
  }

  /** Bounded per-group top-k via [[graft.functions.TopKByScore]]: map-side
    * partial aggregation keeps ≤k candidates per (partition, query) before
    * the shuffle — the scale-correct finisher (VERDICT r1: the former
    * `row_number` window sorted the whole scored corpus in #query
    * partitions). */
  private def topKPerQuery(scored: DataFrame): DataFrame =
    graft.functions.TopKByScore.perGroup(scored, TopK)

  /** Deterministic Rademacher (+1/-1) hyperplanes, generated host-side from a
    * splitmix64-style mix of (plane, dim) — public-domain constant mixing, no
    * RNG state. */
  private def planeSign(j: Int, d: Int): Double = {
    var z = j.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  private def planeLit(j: Int, dim: Int): Column =
    array((0 until dim).map(d => lit(planeSign(j, d))): _*)

  /** Signature bands: [[BandsPerSignature]] ints, each packing
    * SignatureBits/BandsPerSignature sign bits of hyperplane projections. */
  private def signatureBands(v: Column, dim: Int): Column = {
    val bitsPerBand = SignatureBits / BandsPerSignature
    array((0 until BandsPerSignature).map { b =>
      (0 until bitsPerBand).map { i =>
        val j = b * bitsPerBand + i
        when(dot(v, planeLit(j, dim)) >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
  }

  /** ANN top-k via sign-LSH banding: a corpus vector is a candidate for a
    * query iff they agree on at least one 4-bit band of hyperplane signs.
    * Exact cosine on candidates only. Same output shape as [[cosineTopK]];
    * recall < 1 by construction (documented approximation). */
  def annLshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 64
    val vs = vectors(spark, sfDir).withColumn("bands", signatureBands(col("v"), dim))
    val exploded = vs.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(col("bands"))).withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bv")
    val queries = exploded.where(col("vec_id") < NumQueryVectors)
      .select(col("band"), col("bv"), col("vec_id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))
    val cands = exploded.join(broadcast(queries), Seq("band", "bv"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("v"),
        col("nrm"), col("qv"), col("qn"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      (dot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine_sim"))
    topKPerQuery(scored)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_ann_lsh_topk" -> (annLshTopK _),
  )

  /** The 32 hyperplanes as '0'/'1' sign strings (bit d = plane component d
    * is +1), interpolated into the ANN oracle as literals so DuckDB builds
    * bit-identical signatures. */
  private def planeBits(j: Int, dim: Int): String =
    (0 until dim).map(d => if (planeSign(j, d) > 0) '1' else '0').mkString

  private def planesValues(dim: Int): String =
    (0 until SignatureBits).map(j => s"($j, '${planeBits(j, dim)}')").mkString(", ")

  // Both similarity queries are fully oracle-checked: the ANN hyperplanes
  // are deterministic literals on both engines, and dot products fold in
  // identical element order (Spark sequential aggregate ≡ DuckDB
  // list_dot_product), so the candidate sets match exactly.
  val oracleSql: Map[String, String] = Map(
    "sim_ann_lsh_topk" ->
      s"""WITH planes(j, s) AS (VALUES ${planesValues(64)}),
         | pl AS (SELECT j, list_transform(range(64),
         |     d -> CASE WHEN substring(s, CAST(d + 1 AS INTEGER), 1) = '1'
         |          THEN 1.0 ELSE -1.0 END) AS p FROM planes),
         | vs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                         CAST(embedding AS DOUBLE[]))) AS nrm
         |   FROM embeddings),
         | bits AS (SELECT vec_id, j,
         |     CASE WHEN list_dot_product(v, p) >= 0
         |          THEN (1 << CAST(j % ${SignatureBits / BandsPerSignature} AS INTEGER))
         |          ELSE 0 END AS bit
         |   FROM vs CROSS JOIN pl),
         | bands AS (SELECT vec_id,
         |     CAST(j // ${SignatureBits / BandsPerSignature} AS INTEGER) AS band,
         |     SUM(bit) AS bv
         |   FROM bits GROUP BY 1, 2),
         | cands AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |   FROM bands c JOIN bands q ON c.band = q.band AND c.bv = q.bv
         |   WHERE q.vec_id < $NumQueryVectors AND c.vec_id <> q.vec_id),
         | scored AS (SELECT query_id, neighbor_id,
         |     list_dot_product(vc.v, vq.v) / (vc.nrm * vq.nrm) AS cosine_sim
         |   FROM cands JOIN vs vc ON vc.vec_id = cands.neighbor_id
         |   JOIN vs vq ON vq.vec_id = cands.query_id)
         | SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
         | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank FROM scored)
         | WHERE rank <= $TopK""".stripMargin,
    "sim_cosine_topk" ->
      s"""WITH vs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                         CAST(embedding AS DOUBLE[]))) AS nrm
         |   FROM embeddings),
         | q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM vs
         |   WHERE vec_id < $NumQueryVectors),
         | scored AS (SELECT q.query_id, vs.vec_id AS neighbor_id,
         |   list_dot_product(vs.v, q.qv) / (vs.nrm * q.qn) AS cosine_sim
         |   FROM vs CROSS JOIN q WHERE vs.vec_id <> q.query_id)
         | SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
         | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank FROM scored)
         | WHERE rank <= $TopK""".stripMargin,
  )
}
