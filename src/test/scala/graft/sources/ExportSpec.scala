package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ExportSpec extends SparkSpec with Matchers {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-export-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("write + readback manifest equals the planned manifest (parquet)") {
    val out = tmpDir("pq")
    val written = Export.writeCurated(spark, sf(), out).collect()
    val planned = Export.qExportManifest(spark, sf()).collect()
    written.map(_.toSeq) shouldBe planned.map(_.toSeq)
    written.length shouldBe Export.ExportShards
  }

  test("write + readback manifest equals the planned manifest (jsonl)") {
    val out = tmpDir("js")
    val written = Export.writeCurated(spark, sf(), out, format = "json").collect()
    val planned = Export.qExportManifest(spark, sf()).collect()
    written.map(_.toSeq) shouldBe planned.map(_.toSeq)
  }

  test("layout is deterministic: one sorted file per shard, byte-identical across writes") {
    val out1 = tmpDir("d1")
    val out2 = tmpDir("d2")
    Export.writeCurated(spark, sf(), out1)
    Export.writeCurated(spark, sf(), out2)
    def shardFiles(out: String): Map[String, Seq[Array[Byte]]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName).toSeq.map(f =>
              Files.readAllBytes(f.toPath).toSeq.toArray)
        }.toMap
    val f1 = shardFiles(out1)
    val f2 = shardFiles(out2)
    f1.keySet shouldBe (0 until Export.ExportShards).map(i => s"shard=$i").toSet
    f1.foreach { case (shard, bytes) =>
      bytes.length shouldBe 1 // exactly one file per shard
      bytes.head shouldBe f2(shard).head // byte-identical re-export
    }
    // rows inside a shard file are doc_id-sorted
    val rows = spark.read.parquet(out1 + "/shard=0")
      .select(col("doc_id")).collect().map(_.getLong(0))
    rows shouldBe rows.sorted
  }

  test("exported rows reproduce the oracle-checked clean corpus md5s") {
    val out = tmpDir("md5")
    Export.writeCurated(spark, sf(), out)
    val exported = spark.read.parquet(out)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"))
    val reference = graft.operators.Dedup.qDedupLinesKeep(spark, sf())
      .select(col("doc_id"), col("clean_md5"))
    exported.except(reference).count() shouldBe 0
    reference.except(exported).count() shouldBe 0
  }

  test("compaction plan: covers every shard once, bins near target, " +
    "never splits a shard") {
    val manifest = Export.qExportManifest(spark, sf()).collect()
    val bins = Export.qExportCompact(spark, sf()).collect()
    // total conservation: every shard lands in exactly one bin
    bins.map(_.getLong(1)).sum shouldBe manifest.length.toLong
    bins.map(_.getLong(2)).sum shouldBe manifest.map(_.getLong(1)).sum
    bins.map(_.getLong(3)).sum shouldBe manifest.map(_.getLong(3)).sum
    // bin ids are dense from 0 (the sequential recurrence emits in order)
    bins.map(_.getLong(0)).sorted.toSeq shouldBe
      (0L until bins.length.toLong)
    // next-fit bound: a bin only exceeds the target when a single shard
    // does — with multiple shards the last one must have fit
    val total = manifest.map(_.getLong(3)).sum
    val target = (total + Export.CompactBins - 1) / Export.CompactBins
    val maxShard = manifest.map(_.getLong(3)).max
    bins.foreach { b =>
      if (b.getLong(1) > 1) b.getLong(3) should be <= target + maxShard
    }
  }

  test("compaction execution preserves content: written-file fingerprints " +
    "equal the shard-manifest xor per bin") {
    val out = tmpDir("compact")
    val written = Export.writeCompacted(spark, sf(), out).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // plan ↔ execution: same bins, same doc/char mass
    val plan = Export.qExportCompact(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    written.keySet shouldBe plan.keySet
    plan.foreach { case (bin, (docs, chars)) =>
      written(bin)._1 shouldBe docs
      written(bin)._2 shouldBe chars
    }
    // content preservation: the per-bin fingerprint recomputed from the
    // files equals the xor of the constituent shards' manifest
    // fingerprints — every row moved, no row changed
    val shardFp = Export.qExportManifest(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val assign = Export.compactAssignment(spark, sf()).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap // shard -> bin
    val expected = assign.groupBy(_._2).map { case (bin, shards) =>
      bin -> shards.keys.map(shardFp).foldLeft(0L)(_ ^ _)
    }
    written.map { case (bin, (_, _, fp)) => bin -> fp } shouldBe expected
  }

  test("unsupported format fails fast") {
    an[IllegalArgumentException] should be thrownBy
      Export.writeCurated(spark, sf(), tmpDir("bad"), format = "csv")
  }
}
