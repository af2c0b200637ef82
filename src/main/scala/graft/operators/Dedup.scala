package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Document deduplication operators over the `documents` table — the
  * large-scale training-data-pipeline extension surface (BASELINE.json north
  * star; the reference itself has no dedup, SURVEY.md §2.2 "not have" list).
  *
  * All implementations are pure `org.apache.spark.sql.functions` higher-order
  * expressions (whole-stage codegen, no UDFs) and follow the standard
  * shuffle-bounded shapes for 100 TB:
  *   - exact: group by content digest (shuffles a 64-char hash, never the
  *     document body);
  *   - MinHash+LSH: signature → banded bucket join (candidates only within
  *     equal band hashes) → exact Jaccard verify on the candidate pairs;
  *   - SimHash: 64-bit signature, 4×16-bit band blocking, Hamming verify;
  *   - n-gram Jaccard: inverted shingle index with a document-frequency cap
  *     (prefix-filter-style candidate pruning), exact verify.
  */
object Dedup {

  val ShingleSize = 3
  val NumHashes = 128
  val Bands = 16 // x 8 hashes per band
  val JaccardThreshold = 0.7
  val SimhashHammingMax = 3
  /** Shingles seen in more than this many docs generate no candidate pairs
    * (bounds bucket fan-out; at scale this is the skew guard). */
  val MaxShingleDf = 50

  /** Distinct word k-shingles; docs shorter than k fall back to the whole
    * text as a single shingle. */
  def wordShingles(text: Column): Column = {
    val toks = split(text, " ")
    when(size(toks) >= ShingleSize,
      array_distinct(transform(
        sequence(lit(0), size(toks) - ShingleSize),
        i => concat_ws(" ",
          get(toks, i), get(toks, i + 1), get(toks, i + 2)))))
      .otherwise(array(text))
  }

  /** Exact dedup: group by sha256(text). Emits one row per distinct content
    * with the smallest doc_id as keeper. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(sha2(col("text"), 256).as("content_sha"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of [[NumHashes]] seeded hash functions, the
    * minimum xxhash64 over the shingle set. */
  def minhashSignature(shingles: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      s => array_min(transform(shingles, sh => xxhash64(sh, s))))

  /** MinHash+LSH near-dup clustering: band-bucket candidate join, exact
    * Jaccard verify at [[JaccardThreshold]], per-doc cluster id = min doc_id
    * among verified neighbors (single-hop) and self. One output row per
    * document: (doc_id, cluster_id, n_dups). */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), wordShingles(col("text")).as("sh"))
    val sig = docs.withColumn("sig", minhashSignature(col("sh")))
    val rowsPerBand = NumHashes / Bands
    val bands = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    val cand = bands.select(col("band"), col("bh"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("b")),
        Seq("band", "bh"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()

    val verified = verifyJaccard(cand, docs).where(col("jaccard") >= JaccardThreshold)
    val nbrs = verified.select(col("a").as("doc_id"), col("b").as("nbr"))
      .unionAll(verified.select(col("b").as("doc_id"), col("a").as("nbr")))
    val agg = nbrs.groupBy("doc_id")
      .agg(min("nbr").as("min_nbr"), count(lit(1)).as("n_dups"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("min_nbr"), col("doc_id"))).as("cluster_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
  }

  /** Attach both shingle sets to candidate (a, b) pairs and compute exact
    * Jaccard = |∩| / (|A| + |B| - |∩|). */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame): DataFrame =
    cand
      .join(docs.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(docs.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter"))).as("jaccard"))

  private val bitIdx = sequence(lit(0), lit(63))
  private val bitPow = array((0 until 64).map(i => lit(1L << i)): _*)

  /** 64-bit SimHash over word-token xxhash64s: per bit, sum +1/-1 votes over
    * tokens; positive vote count sets the bit. Pure higher-order expressions
    * (fold over token hashes into a 64-counter array). */
  def simhash(text: Column): Column = {
    val hashes = transform(split(text, " "), t => xxhash64(t))
    val counts = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitIdx, (a, i) =>
        a + when(h.bitwiseAND(element_at(bitPow, i + 1)) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, bitIdx, (c, i) =>
        when(c > 0, element_at(bitPow, i + 1)).otherwise(0L)),
      lit(0L), (s, x) => s + x)
  }

  /** SimHash near-dup detection: 4×16-bit band blocking (any pair within
    * Hamming distance 3 shares at least one of 4 bands), verify with
    * bit_count(xor) <= [[SimhashHammingMax]]. One row per document:
    * (doc_id, simhash, cluster_id, n_near). */
  def simhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), simhash(col("text")).as("simhash"))
    val bands = docs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")

    val cand = bands.select(col("band"), col("bv"),
        col("doc_id").as("a"), col("simhash").as("ha"))
      .join(bands.select(col("band"), col("bv"),
        col("doc_id").as("b"), col("simhash").as("hb")), Seq("band", "bv"))
      .where(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct()
      .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= SimhashHammingMax)

    val nbrs = cand.select(col("a").as("doc_id"), col("b").as("nbr"))
      .unionAll(cand.select(col("b").as("doc_id"), col("a").as("nbr")))
    val agg = nbrs.groupBy("doc_id")
      .agg(min("nbr").as("min_nbr"), count(lit(1)).as("n_near"))
    docs.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        least(col("doc_id"), coalesce(col("min_nbr"), col("doc_id"))).as("cluster_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
  }

  /** Exact n-gram (word 3-shingle) Jaccard best-match per document:
    * candidates via inverted shingle index (df-capped), exact verify, keep
    * each doc's best match (max jaccard, tiebreak min other id). One row per
    * document; docs with no candidate pair get nulls. Fully oracle-checkable
    * (same candidate rule reproduced in DuckDB SQL). */
  def ngramJaccardBestMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), wordShingles(col("text")).as("sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val keep = inv.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df").between(2, MaxShingleDf)).select("s")
    val inv2 = inv.join(keep, "s")
    val cand = inv2.select(col("s"), col("doc_id").as("a"))
      .join(inv2.select(col("s"), col("doc_id").as("b")), "s")
      .where(col("a") < col("b"))
      .select("a", "b").distinct()

    val ver = verifyJaccard(cand, docs)
    val nbrs = ver.select(col("a").as("doc_id"), col("b").as("other"), col("jaccard"))
      .unionAll(ver.select(col("b").as("doc_id"), col("a").as("other"), col("jaccard")))
    val best = nbrs.groupBy("doc_id")
      .agg(max_by(struct(col("other"), col("jaccard")),
                  struct(col("jaccard"), (-col("other")).as("nother"))).as("m"))
      .select(col("doc_id"), col("m.other").as("best_match"),
        col("m.jaccard").as("best_jaccard"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
      .select("doc_id", "best_match", "best_jaccard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> (exact _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_simhash"       -> (simhashDedup _),
    "dedup_ngram_jaccard" -> (ngramJaccardBestMatch _),
  )

  /** DuckDB shingle CTEs shared by the jaccard oracle. */
  private val shingleWith =
    """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      | sh AS (SELECT doc_id, CASE WHEN len(t) >= 3
      |   THEN list_distinct(list_transform(range(len(t) - 2),
      |        i -> array_to_string(t[i + 1 : i + 3], ' ')))
      |   ELSE [text] END AS sh FROM toks)""".stripMargin

  // MinHash/SimHash signatures depend on Spark's xxhash64, which DuckDB lacks
  // — those two get the driver's rows-only check (deterministic output).
  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT sha256(text) AS content_sha, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
        | CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY sha256(text)""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""$shingleWith,
         | inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         | keep AS (SELECT s FROM inv GROUP BY s HAVING COUNT(*) BETWEEN 2 AND $MaxShingleDf),
         | inv2 AS (SELECT inv.doc_id, inv.s FROM inv JOIN keep ON inv.s = keep.s),
         | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |   FROM inv2 x JOIN inv2 y ON x.s = y.s AND x.doc_id < y.doc_id),
         | ver AS (SELECT c.a, c.b,
         |   CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |     (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
         |   FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b),
         | nbrs AS (SELECT a AS doc_id, b AS other, jaccard FROM ver
         |   UNION ALL SELECT b, a, jaccard FROM ver),
         | best AS (SELECT doc_id, other, jaccard FROM (
         |   SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |     ORDER BY jaccard DESC, other ASC) AS rn FROM nbrs) WHERE rn = 1)
         | SELECT d.doc_id, best.other AS best_match, best.jaccard AS best_jaccard
         | FROM (SELECT doc_id FROM documents) d
         | LEFT JOIN best ON d.doc_id = best.doc_id""".stripMargin,
  )
}
