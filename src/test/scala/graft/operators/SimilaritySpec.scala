package graft.operators

import graft.SparkSpec

/** ANN self-check (VERDICT r1): recall@k of the sign-LSH path measured
  * against the exact brute-force result, which is itself DuckDB-oracle
  * checked. Uses the driver-generated sf0.001 fixture. */
class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("embedding coverage: per-source masses reconcile and the arrival lag shows as sub-full coverage") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.embeddingCoverage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.sources.Tables.documents(spark, sfDir)
    rows.map(_._2).sum shouldBe docs.count() // every doc accounted once
    val embeddedIds = graft.sources.Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % Dedup.IncomingMod =!= 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val expected = docs.select(col("doc_id"), col("source")).collect()
      .groupBy(_.getString(1))
      .view.mapValues(_.count(r => embeddedIds(r.getLong(0)))).toMap
    rows.foreach { case (src, n, e, c) =>
      e shouldBe expected(src).toLong
      c shouldBe e.toDouble / n
    }
    // the arrival lag shows at the corpus grain (a source whose ids never
    // hit the incoming modulus can legitimately sit at full coverage)
    rows.map(_._3).sum should be < rows.map(_._2).sum
  }

  test("ANN sign-LSH recall@5 vs exact cosine top-k is materially high") {
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLshTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"ANN recall@5 = $recall%.3f over ${exact.size} exact pairs")
    recall should be >= 0.5
  }

  test("embedding audit: robust z recomputes driver-side, flags consistent") {
    // quantile_cont / Spark `percentile` definition: h = p·(n−1),
    // linear interpolation between the two straddling order statistics
    def qcont(sorted: IndexedSeq[Double], p: Double): Double = {
      val h = p * (sorted.length - 1)
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val rows = Similarity.embeddingAudit(spark, sfDir).collect()
    rows.length shouldBe 500
    val norms = rows.map(_.getDouble(2))
    val med = qcont(norms.sorted.toIndexedSeq, 0.5)
    val mad = qcont(norms.map(n => math.abs(n - med)).sorted.toIndexedSeq, 0.5)
    rows.foreach { r =>
      r.getInt(1) shouldBe 64          // fixture dimensionality, un-ragged
      r.getInt(3) shouldBe 0           // finite corpus
      r.getDouble(4) shouldBe
        ((r.getDouble(2) - med) / (Similarity.MadSigma * mad)) +- 1e-9
      r.getBoolean(5) shouldBe (math.abs(r.getDouble(4)) > Similarity.AuditZThreshold)
    }
  }

  test("MMR: engine selection equals a driver-side greedy replay; re-rank diversifies") {
    val out = Similarity.mmrTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    byQ.size shouldBe Similarity.NumQueryVectors
    byQ.values.foreach { g =>
      g.map(_._2).sorted.toSeq shouldBe (1 to Similarity.MmrK)
      g.map(_._3).distinct.length shouldBe Similarity.MmrK
    }
    // greedy replay from the raw fixture (same IEEE op order as the engine)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    byQ.foreach { case (q, rows) =>
      val pool = vecs.keys.filter(_ != q).map(id => id -> cos(q, id)).toSeq
        .sortBy { case (id, r) => (-r, id) }.take(Similarity.MmrPool)
      var sel = Vector(pool.head._1)
      for (_ <- 2 to Similarity.MmrK) {
        val pick = pool.filterNot(p => sel.contains(p._1)).map { case (id, r) =>
          id -> (Similarity.MmrLambda * r -
            Similarity.MmrDiversity * sel.map(s => cos(id, s)).max)
        }.minBy { case (id, sc) => (-sc, id) }._1
        sel :+= pick
      }
      rows.sortBy(_._2).map(_._3).toSeq shouldBe sel
    }
    // non-vacuous: diversification moves at least one query off plain top-5
    val plain = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    byQ.exists { case (q, rows) =>
      rows.map(_._3).toSet != plain(q).map(_._2).toSet } shouldBe true
  }

  test("reciprocal NN: exactly the mutual bests of the candidate graph, ids unique") {
    val pc = Similarity.pairCosineArtifact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val best = pc.flatMap { case (a, b, c) => Seq(a -> ((b, c)), b -> ((a, c))) }
      .groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2).minBy { case (o, c) => (-c, o) } }
    val out = Similarity.reciprocalNn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out should not be empty
    out.foreach { case (a, b, c) =>
      a should be < b
      best(a)._1 shouldBe b
      best(b)._1 shouldBe a
      c shouldBe best(a)._2
    }
    // each vector has one nearest, so it can sit in at most one pair
    val ids = out.flatMap(t => Seq(t._1, t._2))
    ids.distinct.length shouldBe ids.length
    // completeness: the driver-side replay finds exactly the same pairs
    val expected = best.collect {
      case (v, (o, c)) if v < o && best(o)._1 == v => (v, o, c) }.toSet
    out.toSet shouldBe expected
    // the globally-strongest candidate edge is always mutual
    val gm = pc.maxBy(_._3)
    expected.map(t => (t._1, t._2)) should contain (
      (math.min(gm._1, gm._2), math.max(gm._1, gm._2)))
  }

  test("triplets: negative is hardNegatives' top-1, positive shares the label, margin exact") {
    val t = Similarity.tripletMining(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    t.length shouldBe Similarity.NumQueryVectors
    val hn = Similarity.hardNegatives(spark, sfDir).collect()
      .filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    t.foreach { case (a, p, ps, n, ns, m) =>
      (n, ns) shouldBe hn(a)            // the independent op agrees
      labels(p) shouldBe labels(a)      // positive from the anchor's class
      labels(n) should not be labels(a)
      m shouldBe (ps - ns)              // exact: same doubles, one subtraction
    }
  }

  test("exact top-k output shape: k rows per query, ranks 1..k, sims sorted") {
    val rows = Similarity.cosineTopK(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.size shouldBe Similarity.NumQueryVectors
    byQuery.values.foreach { g =>
      g.map(_.getInt(2)).sorted.toSeq shouldBe (1 to Similarity.TopK)
      val sims = g.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      sims shouldBe sims.sorted.reverse
    }
  }

  test("IVF recall@5 vs exact cosine top-k is materially high") {
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@5 (nprobe=${Similarity.NProbe}) = $recall%.3f")
    recall should be >= 0.3 // bounded by nprobe/nlist coverage
  }

  test("IVF candidates never exceed probe coverage and exclude the query itself") {
    val rows = Similarity.ivfTopK(spark, sfDir).collect()
    rows.foreach { r => r.getLong(1) should not be r.getLong(0) }
    rows.groupBy(_.getLong(0)).values.foreach(_.length should be <= Similarity.TopK)
  }

  test("embedding near-dup dedup: clusters are symmetric, labeled by min id, sized") {
    val out = Similarity.embeddingDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 500 // one row per vector
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      cid shouldBe members.map(_._1).min // component label = min vec_id
      members.foreach(_._3 shouldBe (members.size - 1).toLong) // n_dups
    }
    // calibrated threshold finds real structure on the fixture (non-vacuous)
    out.count(_._3 > 0) should be > 0
  }

  test("matryoshka recall: full width is exact 1.0, hits bounded, one row per sweep dim") {
    val out = Similarity.matryoshkaRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out.keySet shouldBe Similarity.MatryoshkaDims.map(_.toLong).toSet
    val denom = Similarity.TopK * Similarity.NumQueryVectors
    out.values.foreach { case (hits, rec) =>
      hits should (be >= 0L and be <= denom.toLong)
      rec shouldBe hits.toDouble / denom
    }
    // the full-width sweep point IS the reference ranking: exact 1.0, no
    // tolerance — same arithmetic, same tiebreak, nothing to diverge
    out(64L) shouldBe ((denom.toLong, 1.0))
    // truncated hits re-derive from an independent prefix re-ranking
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Similarity.MatryoshkaDims.foreach { d =>
      val tk = Similarity.prefixTopK(spark, sfDir, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      out(d.toLong)._1 shouldBe exact.intersect(tk).size.toLong
    }
  }

  test("ann recall: one row per query, recall in [0,1] and equal to the measured overlap") {
    val recall = Similarity.annRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    recall.keySet shouldBe (0L until Similarity.NumQueryVectors.toLong).toSet
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLshTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    recall.foreach { case (q, rec) =>
      rec should (be >= 0.0 and be <= 1.0)
      val overlap = exact.count(p => p._1 == q && ann.contains(p))
      rec shouldBe overlap.toDouble / Similarity.TopK
    }
  }

  test("binary quantize: packed words reconstruct the per-dimension signs exactly") {
    val raw = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val bq = Similarity.binaryQuantize(spark, sfDir).collect()
    bq.length shouldBe raw.size
    bq.foreach { r =>
      val v = raw(r.getLong(0))
      val expLo = (0 until 32).map(i => if (v(i) > 0f) 1L << i else 0L).sum
      val expHi = (0 until 32).map(i => if (v(32 + i) > 0f) 1L << i else 0L).sum
      r.getLong(1) shouldBe expLo
      r.getLong(2) shouldBe expHi
      r.getLong(3) shouldBe v.count(_ > 0f).toLong
    }
  }

  test("hamming top-k: equals a driver-side replay (pack, top-depth by " +
    "hamming, exact cosine rerank)") {
    val raw = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def pack(v: Seq[Double]): (Long, Long) = (
      (0 until 32).map(i => if (v(i) > 0) 1L << i else 0L).sum,
      (0 until 32).map(i => if (v(32 + i) > 0) 1L << i else 0L).sum)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sigs = raw.view.mapValues(pack).toMap
    val expected = (0L until Similarity.NumQueryVectors.toLong).flatMap { q =>
      val (qlo, qhi) = sigs(q)
      val cand = raw.keys.filter(_ != q).toSeq
        .map { id =>
          val (lo, hi) = sigs(id)
          (id, java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi))
        }
        .sortBy { case (id, ham) => (ham, id) }
        .take(Similarity.BqRerankDepth)
      cand.map { case (id, _) => (id, cos(raw(id), raw(q))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }.toSet
    val got = Similarity.hammingTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
  }

  test("bq recall: one row per query on the 1/k grid, equal to the measured overlap") {
    val recall = Similarity.bqRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    recall.keySet shouldBe (0L until Similarity.NumQueryVectors.toLong).toSet
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bq = Similarity.hammingTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    recall.foreach { case (q, rec) =>
      rec should (be >= 0.0 and be <= 1.0)
      val overlap = exact.count(p => p._1 == q && bq.contains(p))
      rec shouldBe overlap.toDouble / Similarity.TopK
    }
  }

  test("semantic dedup: centroid argmax, keep-lowest-id policy, best lower-id match") {
    val out = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getBoolean(4)))).toMap
    // independent reference: recompute assignment + policy from raw vectors
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val cents = vecs.keys.filter(_ < Similarity.NumCentroids)
    val assign = vecs.keys.map(v => v -> cents.maxBy(c => (cos(v, c), -c))).toMap
    out.size shouldBe vecs.size
    out.foreach { case (v, (cid, dupOf, dupCos, keep)) =>
      cid shouldBe assign(v)
      val lower = vecs.keys.filter(u =>
        u < v && assign(u) == cid && cos(v, u) >= Similarity.CosDupThreshold)
      if (lower.isEmpty) { keep shouldBe true; dupOf shouldBe None }
      else {
        keep shouldBe false
        val best = lower.maxBy(u => (cos(v, u), -u))
        dupOf shouldBe Some(best)
        dupCos.get shouldBe cos(v, best) +- 1e-12
      }
    }
    info(s"${out.count(!_._2._4)} duplicates of ${out.size} vectors")
  }

  test("int8 quantization: scale positive, error bounded by half a quantum") {
    val rows = Similarity.quantizeInt8(spark, sfDir).collect()
    rows.length shouldBe 500
    rows.foreach { r =>
      val (scale, l1, err) = (r.getDouble(1), r.getLong(2), r.getDouble(4))
      scale should be > 0.0
      // 64 dims, |q_i| <= 127 each
      l1 should be <= 64L * 127L
      l1 should be > 0L
      // round() is off by at most half a quantum per element
      err should be <= 0.5 / scale + 1e-12
    }
  }

  test("ADC top-k: well-formed ranks, ascending distances, decent L2 recall") {
    val rows = Similarity.pqAdcTopK(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.size shouldBe Similarity.NumQueryVectors
    byQuery.values.foreach { g =>
      g.map(_.getInt(2)).sorted.toSeq shouldBe (1 to Similarity.TopK)
      val d = g.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      d shouldBe d.sorted
      all(d) should be >= 0.0
    }
    // recall vs brute-force squared-L2 (ADC approximates L2, not cosine)
    val sp = spark
    val vecs = sp.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until Similarity.NumQueryVectors).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (l2(vecs(q), vecs(v)), v)).take(Similarity.TopK)
        .map(q -> _)
    }.toSet
    val adc = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect adc).size.toDouble / exact.size
    info(f"ADC recall@5 vs exact L2 = $recall%.3f")
    recall should be >= 0.2 // quantized distances: approximate by design
  }

  test("IVF+PQ: well-formed top-k whose ADC distances agree with the full ADC scan") {
    val rows = Similarity.ivfPqTopK(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.size shouldBe Similarity.NumQueryVectors
    byQuery.values.foreach { g =>
      g.map(_.getInt(2)).sorted.toSeq shouldBe (1 to Similarity.TopK)
      val d = g.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      d shouldBe d.sorted
    }
    // composition consistency: a pair surfaced by BOTH paths carries the
    // identical ADC distance (IVF only prunes candidates, never rescores)
    val fullAdc = Similarity.pqAdcTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val both = rows.flatMap { r =>
      fullAdc.get((r.getLong(0), r.getLong(1))).map(_ -> r.getDouble(3))
    }
    both should not be empty
    both.foreach { case (full, ivf) => ivf shouldBe full +- 1e-12 }
  }

  test("product quantization: codebook vectors encode as themselves, loss-free") {
    val rows = Similarity.pqCodes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.size shouldBe 500
    // a codebook member's nearest codeword in EVERY subspace is itself:
    // code_m = vec_id for all 8 subspaces -> vec_id replicated in each
    // nibble, and exact reconstruction
    (0L until Similarity.PqCodebookSize).foreach { k =>
      rows(k) shouldBe ((k * 0x11111111L, 0.0))
    }
    // non-codebook vectors: some residual, code within the packed range
    val others = rows.filterNot(_._1 < Similarity.PqCodebookSize).values
    all(others.map(_._2)) should be > 0.0
    all(others.map(_._1)) should (be >= 0L and be <= 0xFFFFFFFFL)
  }

  test("kmeans: complete partition of the corpus, positive spread, trained better than init") {
    val out = Similarity.kmeansTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    out.map(_._1) shouldBe (0L until Similarity.KmeansK.toLong).toArray
    out.map(_._2).sum shouldBe 500L // every vector in exactly one cluster
    all(out.map(_._3)) should be > 0.0
    // training moved the centroids: total inertia under the trained
    // centroids is strictly below the inertia of the frozen init
    // (Lloyd's is monotone; at 0 iterations the "centroids" are raw
    // corpus vectors). Reuse the public face by re-deriving the init
    // inertia from the exact top-1 distance to the first-K vec_ids.
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val inits = (0L until Similarity.KmeansK.toLong).map(vs)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val initInertia = vs.values.map(v => inits.map(c => d2(v, c)).min).sum
    out.map(_._3).sum should be < initInertia
  }

  test("kmeans: invariant across shuffle parallelism — the float32-rounded means claim") {
    // cluster membership and trained coordinates must be BIT-identical
    // whatever the partitioning (the rounding quenches partial-agg sum
    // order); inertia is an order-dependent double sum over members, so
    // it gets tolerance, not equality
    def run() = Similarity.kmeansTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val a = run()
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try { spark.conf.set("spark.sql.shuffle.partitions", "3"); run() }
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    b.keySet shouldBe a.keySet
    a.foreach { case (cid, (n, inertia, ck)) =>
      b(cid)._1 shouldBe n           // same membership
      b(cid)._3 shouldBe ck          // bit-identical trained centroid
      b(cid)._2 shouldBe inertia +- 1e-9 * math.abs(inertia)
    }
  }

  test("kmeans: degenerate corpus — an emptied cluster carries its centroid forward") {
    val sp = spark; import sp.implicits._
    // seeds 0 and 1 share vector A, so the d2=0 tiebreak routes BOTH (and
    // every later copy of A) to cluster 0: cluster 1 is empty from the
    // first assignment on and must survive through the update's
    // carry-forward branch — if an inner join dropped it, its row would
    // vanish from the trained table
    val a = Seq.fill(16)(1.0)
    def b(i: Int) = Seq.tabulate(16)(d => if (d == i) 5.0 else 0.0)
    val vs = (Seq(0L -> a, 1L -> a) ++
      (2 to 7).map(i => i.toLong -> b(i)) ++
      (8L until 100L).map(_ -> a)).toDF("vec_id", "v")
    val cents = Similarity.kmeansCentroids(vs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    cents.keySet shouldBe (0L until Similarity.KmeansK.toLong).toSet
    cents(0L) shouldBe a // mean of the A-pile
    cents(1L) shouldBe a // EMPTY cluster: init centroid carried forward
    (2 to 7).foreach(i => cents(i.toLong) shouldBe b(i)) // single-member seeds
  }

  test("trained IVF: well-formed ascending top-k; recall vs exact L2 is materially high") {
    val out = Similarity.ivfTrainedTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    out.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._3)
      s.map(_._3) shouldBe (1 to s.size)           // dense ranks from 1
      s.map(_._4) shouldBe s.map(_._4).sorted      // distances ascending
      all(s.map(_._4)) should be >= 0.0
    }
    // exact L2 top-5 per query, brute force on the driver
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until Similarity.NumQueryVectors.toLong).flatMap { q =>
      vs.keys.filter(_ != q).toSeq
        .sortBy(n => (d2(vs(q), vs(n)), n)).take(Similarity.TopK).map(q -> _)
    }.toSet
    val got = out.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"trained-IVF recall@5 = $recall%.3f")
    recall should be >= 0.5
  }

  test("MIPS top-k matches a driver-side exact inner-product ranking") {
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (0L until Similarity.NumQueryVectors.toLong).flatMap { q =>
      vs.keys.filter(_ != q).toSeq
        .sortBy(n => (-ip(vs(q), vs(n)), n)).take(Similarity.TopK)
        .zipWithIndex.map { case (n, i) => (q, n, i + 1) }
    }.toSet
    val got = Similarity.mipsTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
  }

  test("range join: sound (every pair truly >= tau, exact cosine), decent recall") {
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      def ip(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      ip(a, b) / (math.sqrt(ip(a, a)) * math.sqrt(ip(b, b)))
    }
    val out = Similarity.rangeSimJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.foreach { case (a, b, s) =>
      a should be < b
      s should be >= Similarity.RangeSimTau
      s shouldBe cos(vs(a), vs(b)) +- 1e-9
    }
    val ids = vs.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j && cos(vs(i), vs(j)) >= Similarity.RangeSimTau
    } yield (i, j)).toSet
    val got = out.map(t => (t._1, t._2)).toSet
    (got -- truth) shouldBe empty // soundness: no false pair survives verify
    val recall = (got intersect truth).size.toDouble / truth.size
    info(f"range-join recall@tau=${Similarity.RangeSimTau} = $recall%.3f over ${truth.size}")
    recall should be >= 0.2
  }

  test("knn classify: prediction is the driver-side majority vote over exact top-k") {
    val labels = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topk = Similarity.cosineTopK(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val expected = topk.map { case (q, ns) =>
      val votes = ns.groupBy(labels).view.mapValues(_.size).toMap
      // majority, ties toward the smaller label — the operator's contract
      q -> votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
    }
    val got = Similarity.knnClassify(spark, sfDir).collect()
    got.length shouldBe Similarity.NumQueryVectors
    got.foreach { r =>
      val (lbl, n) = expected(r.getLong(0))
      r.getInt(1) shouldBe lbl
      r.getLong(2) shouldBe n.toLong
      r.getInt(3) shouldBe labels(r.getLong(0))
      r.getBoolean(4) shouldBe (lbl == labels(r.getLong(0)))
    }
  }

  test("silhouette: full partition, scores within [-1,1], sizes match training") {
    val sil = Similarity.silhouette(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    sil.keySet shouldBe (0L until Similarity.KmeansK.toLong).toSet
    sil.values.map(_._1).sum shouldBe 500L
    all(sil.values.map(_._2)) should (be >= -1.0 and be <= 1.0)
    // cluster sizes agree with the training rollup — the assignment fold
    // and the (best, runner-up) fold can never route a vector differently
    val train = Similarity.kmeansTrain(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sil.foreach { case (cid, (n, _)) => n shouldBe train(cid) }
  }

  test("ivf recall: one row per query, recall in [0,1] on the 1/k grid, probing helps") {
    val rows = Similarity.ivfRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    rows.length shouldBe Similarity.NumQueryVectors
    val k = Similarity.TopK
    rows.foreach { case (_, rec) =>
      rec should (be >= 0.0 and be <= 1.0)
      (rec * k) shouldBe math.round(rec * k).toDouble +- 1e-9 // exact 1/k grid
    }
    // probing NProbe of KmeansK lists must beat the trivial zero floor on
    // average — a dead-zero mean recall means the probe wiring is broken
    (rows.map(_._2).sum / rows.length) should be > 0.0
  }

  test("pq recall: one row per query on the 1/k grid; ADC finds signal") {
    val rows = Similarity.pqRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    rows.length shouldBe Similarity.NumQueryVectors
    val k = Similarity.TopK
    rows.foreach { case (_, rec) =>
      rec should (be >= 0.0 and be <= 1.0)
      (rec * k) shouldBe math.round(rec * k).toDouble +- 1e-9
    }
    (rows.map(_._2).sum / rows.length) should be > 0.0
  }

  test("bands curve: monotone, full banding equals the LSH referee's mean") {
    val curve = Similarity.lshBandsCurve(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    curve.map(_._1).toSeq shouldBe Similarity.LshBandsSweep
    curve.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => b should be >= a // more bands can only add candidates
      case _ =>
    }
    // all 8 bands indexed IS the registered LSH path: its mean recall
    val refMean = Similarity.annRecall(spark, sfDir).collect()
      .map(_.getDouble(1)).sum / Similarity.NumQueryVectors
    curve.last._2 shouldBe refMean +- 1e-9
  }

  test("nprobe curve: monotone, exact at full probing, agrees with the point referee") {
    val curve = Similarity.ivfNprobeCurve(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    curve.map(_._1).toSeq shouldBe Similarity.NprobeSweep
    curve.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => b should be >= a // more lists can only help
      case _ =>
    }
    curve.last._2 shouldBe 1.0 // probing every list IS the exact scan
    // the sweep point at the production NProbe equals the point referee's mean
    val refMean = Similarity.ivfRecall(spark, sfDir).collect()
      .map(_.getDouble(1)).sum / Similarity.NumQueryVectors
    curve.toMap.apply(Similarity.NProbe) shouldBe refMean +- 1e-9
  }

  test("silhouette: tight distinct piles score near 1, never above 1") {
    val sp = spark; import sp.implicits._
    // eight far-apart piles (one per init seed) with tiny internal jitter:
    // every vector's own-centroid distance is ~0 while the runner-up is
    // far, so every per-cluster mean must land close to 1
    def pile(i: Int, j: Int) =
      Seq.tabulate(16)(d => if (d == i) 100.0 else if (d == 15) j * 0.01 else 0.0)
    val vs = (for (i <- 0 until 8; j <- 0 until 5)
      yield (i + 8L * j) -> pile(i, j)).toDF("vec_id", "v")
    val out = Similarity.silhouetteOf(vs).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    out.map(_._1).sum shouldBe 40L
    all(out.map(_._2)) should (be > 0.9 and be <= 1.0)
  }
}
