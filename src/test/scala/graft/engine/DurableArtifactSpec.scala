package graft.engine

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec
import graft.operators.Dedup

/** Cross-session persistence contract for the durable artifact layer
  * (VERDICT r16 #1): artifacts key on a CORPUS FINGERPRINT, not the
  * `applicationId`, so
  *
  *   1. a second session over an unchanged corpus REOPENS every artifact
  *      (no rebuild — the sf10 warm-pass record measured the rebuild tax
  *      at 9–100× on the carrier queries);
  *   2. a REGENERATED corpus (new mtimes/sizes at the same path) maps to
  *      a fresh key and rebuilds — never a stale read;
  *   3. a partial artifact (no completion marker — crashed writer) is
  *      discarded and rebuilt, never served.
  *
  * "Session" here is genuinely cross-process: `Artifacts.durable` holds
  * NO process state — the reopen decision reads only the filesystem
  * marker — so anything proven about a second call in this JVM holds for
  * a second JVM on the same root (the measured two-JVM proof is the sf10
  * cold→warm A/B in SCALE_SWEEP §round-17). */
class DurableArtifactSpec extends SparkSpec {

  /** A private (root, corpus) sandbox so mutation never touches shared
    * fixtures: corpus v1 = 40 docs with exact duplicates. */
  private lazy val root = Files.createTempDirectory("graft-durable-root-")
  private lazy val corpus = {
    val d = Files.createTempDirectory("graft-durable-corpus-")
    writeCorpus(d.toString, nDocs = 40)
    d.toString
  }

  private def writeCorpus(dir: String, nDocs: Int): Unit = {
    val sp = spark; import sp.implicits._
    // doc_id mod 4 shares text → exact-dup groups the dr map collapses
    (0 until nDocs).map { i =>
      val text = s"the quick brown fox ${i % 4} jumps over the lazy dog"
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def withRoot[T](f: => T): T = {
    val prior = spark.conf.getOption(Artifacts.DirKey)
    spark.conf.set(Artifacts.DirKey, root.toString)
    try f finally prior match {
      case Some(v) => spark.conf.set(Artifacts.DirKey, v)
      case None    => spark.conf.unset(Artifacts.DirKey)
    }
  }

  private def builds: Long = Artifacts.buildsRun.get()

  test("fingerprint: stable under repetition, distinct across raw dir " +
    "aliases, sensitive to file mtime") {
    val fp1 = Artifacts.fingerprint(spark, corpus)
    Artifacts.fingerprint(spark, corpus) shouldBe fp1
    // raw-string keying: a path alias of the same files is a distinct key
    val alias = corpus.replaceFirst("/graft-", "/./graft-")
    Artifacts.fingerprint(spark, alias) should not be fp1
    // touching one data file invalidates the fingerprint
    val part = Files.list(Paths.get(corpus, "documents.parquet"))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    val t0 = Files.getLastModifiedTime(part)
    Files.setLastModifiedTime(part, FileTime.fromMillis(t0.toMillis + 2000))
    try Artifacts.fingerprint(spark, corpus) should not be fp1
    finally Files.setLastModifiedTime(part, t0)
    Artifacts.fingerprint(spark, corpus) shouldBe fp1
  }

  test("durable: builds once, then reopens from the filesystem marker " +
    "alone — a fresh session pays zero rebuilds on an unchanged corpus") {
    withRoot {
      val b0 = builds
      val cold = Dedup.drArtifact(spark, corpus)
      cold.count() shouldBe 40L
      builds shouldBe b0 + 1
      // second consumer: reopen, no rebuild
      assertSameRows(Dedup.drArtifact(spark, corpus), cold)
      builds shouldBe b0 + 1
      // the reopen path consults ONLY the marker — prove it with a
      // builder that must not run (a fresh process differs from this one
      // exactly by its in-memory state, of which durable keeps none)
      var ran = false
      val p = Artifacts.durable(spark, "sigs", corpus) { _ => ran = true }
      ran shouldBe false
      p shouldBe Artifacts.durablePath(spark, "sigs", corpus)
    }
  }

  test("staleness tripwire: a regenerated corpus rebuilds and serves the " +
    "NEW corpus — never a stale read") {
    withRoot {
      Dedup.drArtifact(spark, corpus).count() shouldBe 40L
      val oldPath = Artifacts.durablePath(spark, "sigs", corpus)
      // regenerate in place: fewer docs, new bytes, same directory.
      // (Parquet mtimes have second granularity on some filesystems —
      // make the change unambiguous in size too.)
      writeCorpus(corpus, nDocs = 24)
      val b0 = builds
      Artifacts.durablePath(spark, "sigs", corpus) should not be oldPath
      val fresh = Dedup.drArtifact(spark, corpus)
      fresh.count() shouldBe 24L // the new corpus, not the stale 40-doc map
      builds shouldBe b0 + 1
      // restore v1 for any later test ordering
      writeCorpus(corpus, nDocs = 40)
    }
  }

  test("a partial artifact without the completion marker is rebuilt, " +
    "not served") {
    withRoot {
      val p = Paths.get(Artifacts.durablePath(spark, "partialcheck", corpus))
      Files.createDirectories(p)
      Files.writeString(p.resolve("junk.parquet"), "torn write")
      val b0 = builds
      var ran = false
      Artifacts.durable(spark, "partialcheck", corpus) { tmp =>
        ran = true
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(tmp, "data.txt"), "good")
      }
      ran shouldBe true
      builds shouldBe b0 + 1
      Files.exists(p.resolve("junk.parquet")) shouldBe false
      Files.readString(p.resolve("data.txt")) shouldBe "good"
      Files.exists(p.resolve("_GRAFT_OK")) shouldBe true
    }
  }

  test("concurrent first-consumers build exactly once (in-process " +
    "serialization) and all read one artifact") {
    withRoot {
      val b0 = builds
      val n = new java.util.concurrent.atomic.AtomicInteger
      val threads = (1 to 4).map(_ => new Thread(() => {
        Artifacts.durable(spark, "racecheck", corpus) { tmp =>
          n.incrementAndGet()
          Files.createDirectories(Paths.get(tmp))
          Files.writeString(Paths.get(tmp, "one.txt"), "1")
        }
        ()
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      n.get() shouldBe 1
      builds shouldBe b0 + 1
    }
  }
}
