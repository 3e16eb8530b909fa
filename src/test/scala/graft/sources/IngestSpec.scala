package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.tables.Tables

class IngestSpec extends SparkSpec with Matchers {

  test("ingest ledger accounts for every input line: sum(n_records) = corpus size") {
    val ledger = Ingest.qIngestJsonl(spark, sf()).collect()
    val total = ledger.map(_.getAs[Long]("n_records")).sum
    total shouldBe Tables.documents(spark, sf()).count()
  }

  test("malformed plant is detected exactly: quarantine row = the mod-97 docs") {
    val ledger = Ingest.qIngestJsonl(spark, sf())
    val mal = ledger.filter(col("source") === "__malformed__").collect()
    mal should have length 1
    val expected = Tables.documents(spark, sf())
      .filter(col("doc_id") % Ingest.MalformedMod === 0).count()
    expected should be > 0L // the plant exists at every SF (doc_id 0)
    mal.head.getAs[Long]("n_records") shouldBe expected
    // quarantined, not parsed: no ids, langs, or chars attributed
    mal.head.getAs[Long]("n_ids") shouldBe 0L
    mal.head.getAs[Long]("n_chars") shouldBe 0L
  }

  test("parse round-trips text exactly: good records equal the parquet source set") {
    // JSON escaping must be lossless — compare the full multiset of
    // (source, lang, text) both directions via exceptAll
    val good = Ingest.parsed(spark, sf())
      .filter(!col("is_malformed"))
      .select(col("source"), col("lang"), col("text"))
    val orig = Tables.documents(spark, sf())
      .filter(col("doc_id") % Ingest.MalformedMod =!= 0)
      .select(col("source"), col("lang"), col("text"))
    good.exceptAll(orig).count() shouldBe 0L
    orig.exceptAll(good).count() shouldBe 0L
  }

  test("content-addressed ids are stable and collide only on identical content") {
    val ledger = Ingest.qIngestJsonl(spark, sf())
      .filter(col("source") =!= "__malformed__").collect()
    // distinct (source, text) pairs from the parquet side = expected ids
    val expected = Tables.documents(spark, sf())
      .filter(col("doc_id") % Ingest.MalformedMod =!= 0)
      .groupBy(col("source"))
      .agg(countDistinct(col("source"), col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    ledger.foreach { r =>
      withClue(r.getAs[String]("source")) {
        r.getAs[Long]("n_ids") shouldBe expected(r.getAs[String]("source"))
        r.getAs[Long]("n_ids") should be <= r.getAs[Long]("n_records")
      }
    }
  }

  test("streaming ingest twin: shard-at-a-time arrival converges to the batch ledger") {
    val q = Ingest.ingestStream(spark, sf())
      .writeStream
      .format("memory")
      .queryName("ingest_ledger")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      // shard-per-trigger arrival really happened: at least one trigger
      // per fixture shard ingested rows
      q.recentProgress.count(_.numInputRows > 0) should be >= Ingest.IngestShards
      val streamed = spark.table("ingest_ledger")
        .collect().map(_.toSeq).sortBy(_.head.toString)
      val batch = Ingest.ledgerLite(Ingest.parsed(spark, sf()))
        .collect().map(_.toSeq).sortBy(_.head.toString)
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS ingest_ledger")
      ()
    }
  }

  test("streaming ingest→dedup composition: drained claims reproduce the " +
    "batch parse→address→keep-first pipeline, duplicates included") {
    val q = Ingest.ingestDedupStream(spark, sf())
      .writeStream.format("memory").queryName("pipeline_claims")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val claims = spark.table("pipeline_claims")
      // per source: arrivals, kept (first claim per content id), chars kept
      val streamed = claims.groupBy(col("source"))
        .agg(count(lit(1)).as("n_seen"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // batch twin over the same combined fixture: group by content id,
      // keep one per id (identical content ⇒ per-source ledger is
      // arrival-order independent)
      val batch = spark.read
        .schema("source STRING, lang STRING, text STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(Ingest.pipelineFixturePath(spark, sf()))
        .filter(col("_corrupt_record").isNull)
        .select(
          conv(substring(md5(concat(col("source"), lit("\u0001"), col("text"))),
            1, 15), 16, 10).cast("long").as("cid"),
          col("source"),
          org.apache.spark.sql.functions.length(col("text"))
            .cast("long").as("n_chars"))
        .groupBy(col("cid"))
        .agg(first(col("source")).as("source"), count(lit(1)).as("copies"),
          first(col("n_chars")).as("nc"))
        .groupBy(col("source"))
        .agg(sum(col("copies")).as("n_seen"), count(lit(1)).as("n_kept"),
          sum(col("nc")).as("chars"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      streamed shouldBe batch
      // the dedup stage demonstrably dropped the planted re-crawls
      streamed.values.map(v => v._1 - v._2).sum should be > 0L
      // shard-at-a-time arrival really happened (original + re-crawl shards)
      q.recentProgress.count(_.numInputRows > 0) should be >=
        (Ingest.IngestShards + 1)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS pipeline_claims")
      ()
    }
  }

  test("crawl delta: class totals match the plant rules") {
    val rows = Ingest.qCrawlDelta(spark, sf()).collect()
    def total(c: String) = rows.map(_.getAs[Long](c)).sum
    val docs = Tables.documents(spark, sf())
    val n = docs.count()
    val removed = docs.filter(col("doc_id") % 13 === 0).count()
    val added = docs.filter(col("doc_id") % 17 === 0).count()
    val changed = docs
      .filter(col("doc_id") % 13 =!= 0 && col("doc_id") % 11 === 0).count()
    total("n_removed") shouldBe removed
    total("n_added") shouldBe added
    total("n_changed") shouldBe changed
    total("n_unchanged") shouldBe n - removed - changed
    // every mutation class is represented at every SF
    Seq(removed, added, changed).foreach(_ should be > 0L)
  }

  test("vocab drift: the snapshot edits introduce exactly their new tokens") {
    val r = Ingest.qVocabDrift(spark, sf()).head()
    // ' updated' and ' addendum' are the only token-level additions
    r.getAs[Long]("n_new") shouldBe 2L
    r.getAs[Long]("n_vocab_b") shouldBe r.getAs[Long]("n_vocab_a") +
      r.getAs[Long]("n_new") - r.getAs[Long]("n_lost")
  }

  test("q_scd2: per doc the version intervals are disjoint, cover every " +
    "epoch, and carry exactly one current version — all without a Window") {
    val rows = Ingest.qScd2(spark, sf()).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"), r.getAs[Long]("is_current")))
    val nDocs = graft.tables.Tables.documents(spark, sf()).count()
    val byDoc = rows.groupBy(_._1)
    byDoc should have size nDocs.toInt
    byDoc.foreach { case (id, vs) =>
      withClue(s"doc $id") {
        val sorted = vs.sortBy(_._2)
        // contiguous disjoint cover of [0, Scd2Epochs): the no-revert
        // precondition of the algebraic interval construction
        sorted.head._2 shouldBe 0L
        sorted.last._3 shouldBe (Ingest.Scd2Epochs - 1).toLong
        sorted.sliding(2).foreach {
          case Array(a, b) => b._2 shouldBe a._3 + 1
          case _ =>
        }
        vs.count(_._4 == 1L) shouldBe 1
        // version count = 1 + revisions at epochs ≥ 1 (the epoch-0
        // revision only names the initial state)
        vs.length shouldBe 1 + (1 until Ingest.Scd2Epochs)
          .count(e => (id + e) % Ingest.Scd2RevMod == 0)
      }
    }
    val plan = Ingest.qScd2(spark, sf()).queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
  }

  test("q_scd2_join: every fact resolves exactly one version (epoch " +
    "conservation), and last-epoch facts all land on the current row") {
    val rows = Ingest.qScd2Join(spark, sf()).collect()
    val nEvents = graft.tables.Tables.events(spark, sf()).count()
    rows.map(_.getAs[Long]("n_facts")).sum shouldBe nEvents
    rows.foreach { r =>
      // exactly-one-match: the joined count per epoch equals the raw
      // fact count per epoch (intervals partition the epoch axis)
      val raw = graft.tables.Tables.events(spark, sf())
        .filter(col("event_id") % Ingest.Scd2Epochs === r.getAs[Long]("epoch"))
        .count()
      r.getAs[Long]("n_facts") shouldBe raw
      r.getAs[Long]("n_on_current") should be <= r.getAs[Long]("n_facts")
    }
    val last = rows.find(_.getAs[Long]("epoch") == Ingest.Scd2Epochs - 1L).get
    last.getAs[Long]("n_on_current") shouldBe last.getAs[Long]("n_facts")
    // the temporal lookup is a keyed join with a range residual — never
    // a broadcast nested loop over the corpus
    val plan = Ingest.qScd2Join(spark, sf())
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("fixture layout: one gzip file per shard, scan parallelism = shard count") {
    val path = Ingest.fixturePath(spark, sf())
    val shardDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).toSeq
    shardDirs should have size Ingest.IngestShards.toLong
    shardDirs.foreach { d =>
      d.listFiles().count(_.getName.endsWith(".gz")) shouldBe 1
    }
  }

  test("q_ingest_csv: quarantine equals the mod-89 plant, every line " +
    "accounted, and the quoted note field round-trips byte-exactly") {
    val ledger = Ingest.qIngestCsv(spark, sf()).collect()
    ledger.map(_.getAs[Long]("n_records")).sum shouldBe
      Tables.documents(spark, sf()).count()
    val mal = ledger.filter(_.getString(0) == "__malformed__")
    mal should have length 1
    mal.head.getAs[Long]("n_records") shouldBe
      Tables.documents(spark, sf())
        .filter(col("doc_id") % Ingest.CsvMalformedMod === 0).count()
    mal.head.getAs[Long]("n_ids") shouldBe 0L
    // note_xor equals the fingerprint recomputed from the parquet source:
    // the comma-and-quote-bearing note survived the CSV dialect intact
    val want = Tables.documents(spark, sf())
      .filter(col("doc_id") % Ingest.CsvMalformedMod =!= 0)
      .select(col("source"),
        conv(substring(md5(concat(lit("len=\""),
          col("n_chars").cast("string"), lit("\", lang="), col("lang"))),
          1, 15), 16, 10).cast("long").as("nid"))
      .groupBy(col("source"))
      .agg(expr("bit_xor(nid)").as("note_xor"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ledger.filter(_.getString(0) != "__malformed__").foreach { r =>
      r.getAs[Long]("note_xor") shouldBe want(r.getString(0))
    }
  }

  test("q_merge_upsert: the merge mechanics reproduce the post-change " +
    "snapshot's census exactly") {
    val want = Ingest.snapshotB(spark, sf())
      .select(col("source"),
        conv(substring(md5(concat(col("source"), lit(""),
          col("text"))), 1, 15), 16, 10).cast("long").as("cid"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(cid)").as("id_xor"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = Ingest.qMergeUpsert(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe want
    // deletes really deleted: merged mass < target + inserts
    val target = Tables.documents(spark, sf()).count()
    val inserts = Tables.documents(spark, sf())
      .filter(col("doc_id") % 17 === 0).count()
    got.values.map(_._1).sum should be < (target + inserts)
  }
}
