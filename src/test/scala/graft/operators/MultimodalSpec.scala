package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("crossmodal top-k: video queries retrieve image-only neighbors, well-formed ranks") {
    val out = Multimodal.crossmodalTopK(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    out should not be empty
    // modality separation is structural, not probabilistic
    all(out.map(_._1 % 3)) shouldBe 2       // queries are video vectors
    all(out.map(_._2 % 3)) shouldBe 0       // neighbors are image vectors
    all(out.map(_._1)) should be < Multimodal.CrossmodalQueryBound.toLong
    // per query: ranks are 1..n, ordered by (cosine desc, neighbor asc)
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      sorted.map(_._3).toSeq shouldBe (1 to g.length).toSeq
      g.length should be <= Similarity.TopK
      sorted.map(t => (-t._4, t._2)).toSeq shouldBe
        sorted.map(t => (-t._4, t._2)).toSeq.sorted
    }
    // the scores are genuine cosines of the two sides' vectors: spot-check
    // the top hit of the lowest query against a direct computation
    val sp = spark; import sp.implicits._
    val vs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val (q, n, _, cs) = out.minBy(t => (t._1, t._3))
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    val expect = dot(vs(q), vs(n)) /
      (math.sqrt(dot(vs(q), vs(q))) * math.sqrt(dot(vs(n), vs(n))))
    cs shouldBe expect +- 1e-9
  }

  test("binary stats: byte length, sha256, magic bytes of the payload") {
    val r = Multimodal.binaryStats(docs(3L -> "abc")).collect()(0)
    r.getString(1) shouldBe "image" // 3 % 3 = 0
    r.getLong(2) shouldBe 3L
    // sha256("abc") is a known vector
    r.getString(3) shouldBe
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    r.getString(4) shouldBe "616263" // 'a''b''c' in hex, only 3 bytes
  }

  test("decode stage runs per-partition and is content-deterministic") {
    val input = docs(1L -> "hello world spark", 2L -> "hello world spark",
      4L -> "something else entirely")
    val out = Multimodal.decodeFeatures(
      Multimodal.recordsDs(input.repartition(3))).collect()
      .map(f => f.doc_id -> f).toMap
    out.size shouldBe 3
    // identical payloads decode identically, across partitions
    (out(1L).width, out(1L).height, out(1L).n_frames) shouldBe
      ((out(2L).width, out(2L).height, out(2L).n_frames))
    out(1L).payload_bytes shouldBe 17L
    out(1L).n_frames shouldBe 1
    out(1L).width should (be >= 1 and be <= 1920)
    out(1L).height should (be >= 1 and be <= 1080)
    // different payload -> different features (content-determined)
    (out(4L).width == out(1L).width && out(4L).height == out(1L).height) shouldBe false
  }

  test("modalities cycle deterministically by doc_id") {
    val out = Multimodal.records(docs(0L -> "x", 1L -> "x", 2L -> "x")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(0L -> "image", 1L -> "audio", 2L -> "video")
  }

  test("resize plan fits inside the box, preserves aspect, never upscales") {
    val sp = spark; import sp.implicits._
    val decoded = Seq(
      (1L, "image", 10L, 1920, 1080, 1),  // downscale, landscape
      (2L, "image", 10L, 100, 300, 1),    // downscale, portrait
      (3L, "image", 10L, 200, 100, 1),    // already fits: untouched
      (4L, "image", 10L, 100000, 1, 1))   // extreme aspect: floor to >= 1
      .toDF("doc_id", "modality", "payload_bytes", "width", "height", "n_frames")
    val out = Multimodal.resizePlan(decoded).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    out(1L) shouldBe ((224, 126))  // 1080*224/1920 = 126
    out(2L) shouldBe ((74, 224))   // 100*224/300 = 74
    out(3L) shouldBe ((200, 100))  // no upscaling
    out(4L) shouldBe ((224, 1))    // min 1 px
    out.values.foreach { case (w, h) =>
      w should be >= 1; h should be >= 1
    }
  }

  test("block dedup: payloads sharing most 16-byte blocks match; disjoint ones do not") {
    val sp = spark; import sp.implicits._
    // 16-byte-aligned building blocks so shifts stay block-aligned
    def blk(c: Char) = c.toString * 16
    val base = (0 until 8).map(i => blk(('a' + i).toChar)).mkString
    val mutated = blk('z') + base.drop(16)       // 7 of 8 blocks shared
    val disjoint = (0 until 8).map(i => blk(('q' + i).toChar)).mkString
    val docs = Seq(
      (1L, base, "en", "w"), (2L, mutated, "en", "w"), (3L, disjoint, "en", "w"),
      // a second disjoint pair so doc 3's blocks can pass the df >= 2 gate
      (4L, disjoint, "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Multimodal.blockDedup(docs).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    out(1L)._1 shouldBe Some(2L)
    out(1L)._2.get.asInstanceOf[Double] shouldBe (7.0 / 9.0) +- 1e-12
    out(3L)._1 shouldBe Some(4L) // exact copy: jaccard 1.0
    out(3L)._2 shouldBe Some(1.0)
  }

  test("frame sampling: <=8 uniform frames for video, single frame otherwise") {
    val sp = spark; import sp.implicits._
    val decoded = Seq(
      (1L, "video", 10L, 10, 10, 20),  // 20 frames -> 8 samples
      (2L, "video", 10L, 10, 10, 3),   // 3 frames -> all 3
      (3L, "audio", 10L, 10, 10, 99))  // non-video -> 1 row, frame 0
      .toDF("doc_id", "modality", "payload_bytes", "width", "height", "n_frames")
    val out = Multimodal.frameSample(decoded).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sorted.toSeq).toMap
    out(1L) shouldBe Seq(0L, 2L, 5L, 7L, 10L, 12L, 15L, 17L) // floor(i*20/8)
    out(2L) shouldBe Seq(0L, 1L, 2L)
    out(3L) shouldBe Seq(0L)
  }

  test("mm e2e: the size gate keeps outliers out of the decode + resize stages") {
    val images = (0 until 16).map(i => (i * 3L, "abc"))
    val giant = Seq((48L, "x" * 500))
    val out = Multimodal.endToEnd(docs(images ++ giant: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    out.keySet shouldBe images.map(_._1).toSet // the giant never decodes
    // survivors carry real resize plans within the box
    out.values.foreach { case (w, h) =>
      w should (be >= 1 and be <= Multimodal.ResizeBox)
      h should (be >= 1 and be <= Multimodal.ResizeBox)
    }
  }

  test("size outliers: a modality's lone giant flags against its own peers only") {
    // 17 image docs (ids ≡ 0 mod 3): 16 short + 1 giant -> the giant
    // z-scores at sqrt(16) = 4 within 'image'; the audio docs share a size
    // and must all stay unflagged (zero variance -> z pinned to 0)
    val images = (0 until 16).map(i => (i * 3L, "abc"))
    val giant = Seq((48L, "x" * 500))
    val audios = Seq((1L, "same size"), (4L, "same size"), (7L, "same size"))
    val out = Multimodal.sizeOutliers(docs(images ++ giant ++ audios: _*))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(3), r.getBoolean(4)))).toMap
    val (mod, z, flag) = out(48L)
    mod shouldBe "image"
    z shouldBe 4.0 +- 1e-9
    flag shouldBe true
    out(0L)._3 shouldBe false   // short image: inside the band
    out(0L)._2 should be < 0.0
    audios.foreach { case (id, _) => out(id) shouldBe (("audio", 0.0, false)) }
  }

  test("outlier probe: the inflated sparse ids flag, everything else stays quiet") {
    // ids 0 and 97 inflate 30x; 0 is image-modality, 97 audio (97 % 3 = 1)
    val out = Multimodal.outlierProbe(docs((0L until 120L).map(i => i -> "same text"): _*))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    out(0L) shouldBe true
    out(97L) shouldBe true
    (out - 0L - 97L).values.foreach(_ shouldBe false)
  }

  test("crossmodal recall: one row per video query on the 1/k grid") {
    val rows = Multimodal.crossmodalRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    rows.length shouldBe Multimodal.CrossmodalQueryBound / 3
    rows.foreach { case (q, rec) =>
      q % 3 shouldBe 2            // video modality tags only
      rec should (be >= 0.0 and be <= 1.0)
      (rec * Similarity.TopK) shouldBe
        math.round(rec * Similarity.TopK).toDouble +- 1e-9
    }
  }
}
