package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine fuzz gate (VERDICT r14 #2): break the fixture overfit.
  *
  * All 202 oracles run against ONE fixed driver generator (seed=42) —
  * semantics agreeing on one corpus is weaker than semantics agreeing,
  * period. This tool generates N seed-parameterized corpora with
  * adversarial content knobs, runs a rotating ~30-query subset spanning
  * every family through the engine, and dumps results + oracle SQL in the
  * exact `graft.Verify` layout so `tools/oracle_check.py` can hash-compare
  * each seed against DuckDB. `tools/fuzz_gate.sh` drives the loop and
  * publishes FUZZ.json.
  *
  * Adversarial knobs (each seed draws its own mix, deterministically):
  *   - emptyDocs:   ~15% of documents are "" / 1-char / 1-unicode-char
  *   - unicodeHeavy: the token vocab mixes CJK, emoji, combining accents,
  *     fullwidth forms, RTL text
  *   - allDuplicate: ~70% of documents are exact copies of 6 templates
  *     (stresses the exact-dup pre-collapse and LSH band caps)
  *   - zeroNormVecs: ~10% of embeddings are all-zero (cosine guards),
  *     plus ~5% exact duplicate vectors (top-k tie semantics)
  *   - singleUser:   every event belongs to ONE user (keyed-state hot key,
  *     sessionize/funnel/retention degenerate grouping)
  *   - tsTies:       ~30% of events share 5 exact timestamps (ordering /
  *     rank tie-break semantics)
  *   - hotRoute:     ~50% of trips land on one route (skewed transit aggs)
  *
  * Tables are non-empty by construction (an empty TABLE is a driver-regen
  * failure mode, not a content edge; content edges are the knobs above).
  * Schemas match `Tables.ExpectedColumns` exactly — the generated corpora
  * pass the same schema tripwire as the driver's.
  *
  * Determinism: everything derives from `new Random(seed)` on the driver;
  * no wall-clock, no per-partition randomness. Timestamps are fixed
  * epochs plus seed-drawn offsets.
  *
  * Run: sbt "Test/runMain graft.FuzzGen <nSeeds> <baseDir> [subsetSize]"
  */
object FuzzGen {

  final case class Knobs(emptyDocs: Boolean, unicodeHeavy: Boolean,
                         allDuplicate: Boolean, zeroNormVecs: Boolean,
                         singleUser: Boolean, tsTies: Boolean,
                         hotRoute: Boolean) {
    def json: String =
      s"""{"emptyDocs":$emptyDocs,"unicodeHeavy":$unicodeHeavy,""" +
        s""""allDuplicate":$allDuplicate,"zeroNormVecs":$zeroNormVecs,""" +
        s""""singleUser":$singleUser,"tsTies":$tsTies,"hotRoute":$hotRoute}"""
  }

  /** Knob mix for a seed: seed 1 is all-off (a fresh baseline corpus — the
    * pure "different seed, same semantics" check), seed 2 is all-on (the
    * maximally hostile corpus), later seeds draw each knob independently. */
  def knobsFor(seed: Int): Knobs = {
    if (seed == 1) return Knobs(false, false, false, false, false, false, false)
    if (seed == 2) return Knobs(true, true, true, true, true, true, true)
    val r = new Random(seed * 7919L)
    Knobs(r.nextBoolean(), r.nextBoolean(), r.nextBoolean(), r.nextBoolean(),
      r.nextBoolean(), r.nextBoolean(), r.nextBoolean())
  }

  private val AsciiVocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "line", "sort",
    "window", "spark", "order", "data", "column", "join", "small", "big",
    "customer", "query", "stream", "group", "filter", "the", "a")
  private val UnicodeVocab = Seq("héllo", "中文词", "🚀", "naïve", "Übermut",
    "данные", "عربي", "ｆｕｌｌｗｉｄｔｈ", "éclair", "ひらがな",
    "🎉🎉", "ß", "Ω≈ç", "𝕦𝕟𝕚")

  private val Day = 86400000L
  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  def generate(spark: SparkSession, seed: Int, outDir: String): Knobs = {
    val k = knobsFor(seed)
    val r = new Random(seed * 104729L)
    val sp = spark; import sp.implicits._
    new java.io.File(outDir).mkdirs()

    def write(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // ---- documents ------------------------------------------------------
    val vocab = if (k.unicodeHeavy) AsciiVocab ++ UnicodeVocab else AsciiVocab
    def sentence(len: Int): String =
      Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" ")
    val templates = Seq.fill(6)(sentence(12 + r.nextInt(40)))
    val nDocs = 400
    val langs = Seq("en", "en", "en", "zh", "es", "de", "fr")
    val docs = (0 until nDocs).map { i =>
      val roll = r.nextDouble()
      val text =
        if (k.emptyDocs && roll < 0.10) ""
        else if (k.emptyDocs && roll < 0.15)
          if (k.unicodeHeavy && r.nextBoolean()) "中" else "a"
        else if (k.allDuplicate && roll < 0.75) templates(r.nextInt(6))
        else if (roll < 0.85) sentence(5 + r.nextInt(65))
        else { // near-dup of a template: mutate one token
          val toks = templates(r.nextInt(6)).split(" ").toVector
          val p = r.nextInt(toks.size)
          toks.updated(p, vocab(r.nextInt(vocab.size))).mkString(" ")
        }
      // n_chars = CODE POINTS, not UTF-16 units: Spark's length() and
      // DuckDB's length() both count code points, and the driver
      // generator's invariant n_chars == length(text) must survive the
      // emoji/astral tokens of the unicodeHeavy knob
      (i.toLong, text, langs(r.nextInt(langs.size)), s"src${r.nextInt(20)}",
        text.codePointCount(0, text.length).toLong)
    }
    write(docs.toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")

    // ---- embeddings (dim 64, float) -------------------------------------
    val dim = 64
    val nVecs = 200
    val base = Array.fill(dim)(r.nextGaussian().toFloat)
    val vecs = (0 until nVecs).map { i =>
      val roll = r.nextDouble()
      val v: Array[Float] =
        if (k.zeroNormVecs && roll < 0.10) Array.fill(dim)(0f)
        else if (roll < 0.15) base.clone() // exact duplicates → tie semantics
        else Array.fill(dim)(r.nextGaussian().toFloat)
      (i.toLong, v.toSeq, r.nextInt(10))
    }
    write(vecs.toDF("vec_id", "embedding", "label"), "embeddings")

    // ---- events ----------------------------------------------------------
    val nEvents = 3000
    val nUsers = if (k.singleUser) 1 else 50
    val types = Seq("view", "view", "view", "click", "click", "signup",
      "purchase", "error")
    val tieTs = Seq.fill(5)(T0 + r.nextInt(30) * Day + r.nextInt(86400) * 1000L)
    val events = (0 until nEvents).map { i =>
      val ts =
        if (k.tsTies && r.nextDouble() < 0.30) tieTs(r.nextInt(5))
        else T0 + r.nextInt(30) * Day + r.nextInt(86400) * 1000L
      (i.toLong, new Timestamp(ts),
        (if (k.singleUser) 7 else r.nextInt(nUsers)).toLong,
        types(r.nextInt(types.size)),
        math.round(r.nextDouble() * 49000 + 1) / 100.0,
        s"""{"k": ${r.nextInt(100)}}""")
    }
    write(events.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props"), "events")

    // ---- transit star schema --------------------------------------------
    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")
    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")
    write((0 until 100).map { i =>
      (i.toLong, f"Customer#$i%09d", r.nextInt(25),
        math.round(r.nextDouble() * 999000) / 100.0,
        Seq("HOUSEHOLD", "MACHINERY", "AUTOMOBILE", "BUILDING",
          "FURNITURE")(r.nextInt(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer")
    write((0 until 20).map { i =>
      (i.toLong, f"Supplier#$i%09d", r.nextInt(25),
        math.round(r.nextDouble() * 999000) / 100.0)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")

    val nParts = 200
    val ptypes = Seq("ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO")
    write((0 until nParts).map { i =>
      (i.toLong, sentence(2), s"Brand#${r.nextInt(20)}",
        ptypes(r.nextInt(5)), 1 + r.nextInt(50),
        math.round(r.nextDouble() * 90000 + 10000) / 100.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"), "part")

    val nOrders = 400
    write((0 until nOrders).map { i =>
      (i.toLong, r.nextInt(100).toLong, Seq("F", "O", "P")(r.nextInt(3)),
        math.round(r.nextDouble() * 49000000) / 100.0,
        new Timestamp(T0 - (1000 + r.nextInt(2000)).toLong * Day),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")(r.nextInt(5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"), "orders")

    val nLines = 3000
    val hot = r.nextInt(nParts).toLong
    write((0 until nLines).map { i =>
      val partKey =
        if (k.hotRoute && r.nextDouble() < 0.5) hot else r.nextInt(nParts).toLong
      (r.nextInt(nOrders * 30).toLong, partKey, r.nextInt(20).toLong,
        1 + r.nextInt(7), (1 + r.nextInt(50)).toDouble,
        math.round(r.nextDouble() * 9000000 + 100000) / 100.0,
        math.round(r.nextDouble() * 10) / 100.0,
        math.round(r.nextDouble() * 8) / 100.0,
        Seq("A", "N", "R")(r.nextInt(3)), Seq("F", "O")(r.nextInt(2)),
        new Timestamp(T0 - (6000 + r.nextInt(3000)).toLong * Day))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"), "lineitem")

    k
  }

  /** Family bucket for subset rotation — transit (q1..q13 + latest_per_key
    * + shard) and corpus (+ sample_*) fold their small satellites in. */
  private def family(name: String): String = name.split("_")(0) match {
    case f if f.matches("q\\d+") => "transit"
    case "latest" | "shard"      => "transit"
    case "sample"                => "corpus"
    case "mm"                    => "mm"
    case f                       => f
  }

  /** Rotating subset: per family, `alloc` names starting at an offset that
    * advances with the seed — every seed spans every family, and the union
    * over seeds walks the whole registry. */
  def subsetFor(seed: Int, size: Int): Seq[String] = {
    val byFam = SparkEntry.queries.keys.toSeq.sorted.groupBy(family)
    val fams = byFam.keys.toSeq.sorted
    val perFam = math.max(1, size / fams.size)
    fams.flatMap { f =>
      val names = byFam(f)
      val alloc = math.min(perFam + (if (f == "text" || f == "events") 1 else 0),
        names.size)
      // stride-1 rotating block: offsets advance with the seed, so the
      // union over seeds walks the whole family (a stride-2 walk only
      // ever visits half of an even-sized family), and alloc == size
      // degenerates to the full family for full-registry passes
      (0 until alloc).map(i => names((seed * alloc + i) % names.size))
    }.distinct
  }

  def main(args: Array[String]): Unit = {
    val nSeeds = args.headOption.map(_.toInt).getOrElse(20)
    val baseDir = args.lift(1).getOrElse("/tmp/graft_fuzz")
    val subsetSize = args.lift(2).map(_.toInt).getOrElse(28)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("FUZZ_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    val seedRecords = (1 to nSeeds).map { seed =>
      val dir = s"$baseDir/seed$seed"
      val subset0 = subsetFor(seed, subsetSize)
      // deterministic per seed → a completed seed dir (all dumps + the
      // oracle json) never needs regenerating; partial dirs rerun whole
      if (new java.io.File(s"$dir/out/oracle_sql.json").isFile &&
          subset0.forall(n => new java.io.File(s"$dir/out/$n").isDirectory)) {
        System.err.println(s"[fuzz] seed=$seed already complete, skipping")
        (seed, knobsFor(seed), subset0.size, List.empty[String])
      } else {
      val knobs = generate(spark, seed, dir)
      val subset = subset0
      var errors = List.empty[String]
      subset.foreach { name =>
        try SparkEntry.queries(name)(spark, dir).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/out/$name")
        catch { case e: Throwable =>
          errors ::= name
          System.err.println(s"[fuzz] seed=$seed $name FAILED: $e")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      val sqlJson = SparkEntry.oracleSql.filter(kv => subset.contains(kv._1))
        .map { case (n, sql) => s""""${esc(n)}": "${esc(sql)}"""" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/out/oracle_sql.json"), sqlJson)
      System.err.println(s"[fuzz] seed=$seed done: ${subset.size} queries, " +
        s"${errors.size} engine errors, knobs=${knobs.json}")
      (seed, knobs, subset.size, errors)
      }
    }

    // one JSON line (bench_out convention) for fuzz_gate.sh to assemble
    val seedsJson = seedRecords.map { case (s, knobs, n, errs) =>
      s""""seed$s":{"knobs":${knobs.json},"queries":$n,""" +
        s""""engine_errors":${errs.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    }.mkString(",")
    val totalErrs = seedRecords.map(_._4.size).sum
    println(s"""{"metric":"graft_fuzz_gen","seeds":$nSeeds,""" +
      s""""subset_size":$subsetSize,"engine_errors_total":$totalErrs,""" +
      s""""seeds_detail":{$seedsJson}}""")
    spark.stop()
    if (totalErrs > 0) sys.exit(1)
  }
}
