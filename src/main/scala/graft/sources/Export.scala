package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Curated-corpus EXPORT SINK — the step every real pipeline ends in
  * (reference: the sorted single-TSV sink, `mapreduce.go:229-266`), at
  * scale-safe granularity: deterministic hash-bucketed shards instead of
  * one global sort/file.
  *
  * Layout: `outPath/shard=K/part-*.parquet` (or JSONL), one file per
  * shard, rows sorted by doc_id within the shard. Shard = md5-bucket of
  * doc_id — engine-portable, balanced under arbitrary id gaps, and
  * independent of content so re-curation never migrates a doc between
  * shards. At 100 TB: shards ≫ 8 (size to ~1 GB files), the write is the
  * one repartition; no global sort, no driver collect, manifest is a
  * #shards-row aggregate.
  *
  * The MANIFEST makes the sink verifiable: per shard, row count, kept-line
  * and char totals, doc_id range, and an order-independent content
  * fingerprint (bit_xor over each doc's 60-bit md5 of `doc_id:clean_text`)
  * — the same numbers are computable from the PLAN (no I/O, the
  * oracle-checked [[qExportManifest]]), from the WRITTEN FILES
  * ([[manifestOf]], spec-pinned equal after a write+readback round trip),
  * and from DuckDB over the raw inputs (the CORRECTNESS gate) — three
  * independent derivations of one contract.
  */
object Export {

  /** Oracle default — baked into the manifest oracle SQL. */
  val ExportShards = 8

  private def shardOf(nShards: Int) =
    graft.operators.Sampling.hashBucket(col("doc_id"), nShards)

  /** 60-bit md5 fingerprint of one exported row (`doc_id:clean_text`). */
  private def docFp =
    graft.functions.SketchExpressions.md5Prefix60Long(concat(
      col("doc_id").cast("string"), lit(":"), col("clean_text")))

  /** The export frame: the line-dedup rewritten corpus + shard + row
    * fingerprint.
    */
  private[graft] def curated(s: SparkSession, dir: String, nShards: Int = ExportShards): DataFrame =
    Dedup.linesKeepCorpus(s, dir)
      .select(
        col("doc_id"), col("n_lines"), col("n_kept"), col("clean_text"),
        shardOf(nShards).as("shard"),
        docFp.as("fp"))

  /** Write the curated corpus as deterministic sharded files and return
    * the manifest RECOMPUTED FROM THE WRITTEN FILES (not from the input
    * plan) — callers comparing it against [[qExportManifest]] get an
    * end-to-end write-path proof.
    *
    * `repartition(nShards, shard)` + `sortWithinPartitions` +
    * `partitionBy(shard)` yields exactly one file per shard with rows in
    * doc_id order — byte-deterministic layout for a fixed corpus.
    */
  def writeCurated(
      s: SparkSession, dir: String, outPath: String,
      nShards: Int = ExportShards, format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "json",
      s"unsupported export format: $format")
    curated(s, dir, nShards)
      .select(col("shard"), col("doc_id"), col("n_kept"), col("clean_text"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .format(format)
      .save(outPath)
    manifestOf(s.read.format(format)
      // JSONL round-trips longs as longs but needs the schema pinned so
      // empty-text rows don't widen types
      .schema("doc_id LONG, n_kept LONG, clean_text STRING, shard INT")
      .load(outPath))
  }

  /** Manifest of an exported (or about-to-be-exported) frame: one row per
    * shard. Order-independent fingerprint so the file-read recomputation
    * does not depend on row order within a shard.
    */
  private[graft] def manifestOf(exported: DataFrame): DataFrame =
    exported
      .select(
        col("shard").cast("long").as("shard"),
        col("doc_id"), col("n_kept"),
        // JSONL exports read clean_text of an empty doc back as null
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .select(col("shard"), col("doc_id"), col("n_kept"),
        length(col("clean_text")).cast("long").as("n_chars"),
        docFp.as("fp"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_kept")).as("n_lines_kept"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(fp)").as("fp_xor"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  /** The manifest computed purely from the plan (no write) — the
    * oracle-checked contract of the sink.
    */
  def qExportManifest(s: SparkSession, dir: String): DataFrame =
    manifestOf(curated(s, dir).select(
      col("shard"), col("doc_id"), col("n_kept"), col("clean_text")))

  /** Compaction bin target: bins aim at ⌈total/3⌉ chars each. */
  val CompactBins = 3L

  private[sources] final case class ShardStat(
      shard: Long, n_docs: Long, n_chars: Long)
  private[sources] final case class ShardBin(
      bin: Long, shard: Long, n_docs: Long, n_chars: Long)

  /** Small-file COMPACTION PLAN — the maintenance operation every
    * long-lived lakehouse table needs (Delta OPTIMIZE / Iceberg
    * rewrite_data_files): group the export's shards into target-sized
    * compaction bins by next-fit over shards ordered largest-first.
    * Planning is METADATA-scale — the input is the #shards-row manifest,
    * never the data — so the sequential next-fit recurrence (inherent:
    * current fill decides the next shard's fate, the [[graft.operators
    * .Sampling.qPackFit]] justification) runs over one bounded
    * partition; executing the plan is then an embarrassingly-parallel
    * per-bin copy. A shard larger than the target keeps its own bin —
    * compaction never splits a file. Output per bin: shard count, doc
    * and char mass; the oracle replays the identical recurrence as a
    * recursive CTE (the q_pack_fit discipline).
    */
  /** The (bin, shard) assignment the plan aggregates — also the routing
    * table [[writeCompacted]] broadcasts to execute it.
    */
  private[sources] def compactAssignment(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qExportManifest(s, dir)
      .select(col("shard"), col("n_docs"), col("n_chars")).as[ShardStat]
      .coalesce(1)
      .sortWithinPartitions(col("n_chars").desc, col("shard"))
      .mapPartitions { it =>
        val shards = it.toArray // bounded: one row per exported shard
        if (shards.isEmpty) Iterator.empty
        else {
          val total = shards.map(_.n_chars).sum
          val target = (total + CompactBins - 1) / CompactBins
          var bin = 0L
          var fill = 0L
          var first = true
          shards.iterator.map { sh =>
            if (!first && fill + sh.n_chars > target) { bin += 1; fill = 0L }
            first = false
            fill += sh.n_chars
            ShardBin(bin, sh.shard, sh.n_docs, sh.n_chars)
          }
        }
      }
      .toDF()
  }

  /** EXECUTE the compaction plan: route every curated row to its bin via
    * a broadcast of the #shards-row assignment, write one file per bin
    * (the same repartition+sortWithinPartitions+partitionBy layout as
    * [[writeCurated]]), and return the per-bin manifest RECOMPUTED FROM
    * THE WRITTEN FILES — (n_docs, n_chars, fp_xor), where fp_xor must
    * equal the xor of the constituent shards' fingerprints: the
    * content-preservation proof that compaction moved every row and
    * changed none (spec-pinned against the plan side).
    */
  def writeCompacted(
      s: SparkSession, dir: String, outPath: String): DataFrame = {
    val assign = compactAssignment(s, dir).select(col("bin"), col("shard"))
    val nBins = assign.agg(max(col("bin"))).head().getLong(0).toInt + 1
    curated(s, dir)
      .join(broadcast(assign), "shard")
      .select(col("bin"), col("doc_id"), col("clean_text"))
      .repartition(nBins, col("bin"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("bin")
      .parquet(outPath)
    s.read.parquet(outPath)
      .select(col("bin").cast("long").as("bin"), col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .select(col("bin"),
        length(col("clean_text")).cast("long").as("n_chars"), docFp.as("fp"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(fp)").as("fp_xor"))
      .orderBy(col("bin"))
  }

  def qExportCompact(s: SparkSession, dir: String): DataFrame = {
    compactAssignment(s, dir)
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("bin"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_export_manifest" -> qExportManifest,
    "q_export_compact" -> qExportCompact
  )

  def oracleSql: Map[String, String] = Map(
    "q_export_manifest" ->
      s"""WITH ${Dedup.linesKeepSqlCtes},
         |m AS (SELECT
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |    % $ExportShards AS shard,
         |  doc_id, n_kept, length(clean_text) AS n_chars,
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || clean_text),
         |    1, 15))::BIGINT AS fp
         |  FROM doc)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_kept) AS BIGINT) AS n_lines_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  bit_xor(fp) AS fp_xor,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM m GROUP BY shard ORDER BY shard""".stripMargin,
    // identical manifest CTEs, then the next-fit recurrence replayed as a
    // recursive CTE (the q_pack_fit oracle discipline)
    "q_export_compact" ->
      s"""WITH RECURSIVE ${Dedup.linesKeepSqlCtes},
         |m AS (SELECT
         |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |    % $ExportShards AS shard,
         |  doc_id, length(clean_text) AS n_chars
         |  FROM doc),
         |sh AS (SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM m GROUP BY shard),
         |ord AS (SELECT shard, n_docs, n_chars,
         |  row_number() OVER (ORDER BY n_chars DESC, shard) AS rn FROM sh),
         |tgt AS (SELECT (sum(n_chars) + $CompactBins - 1) // $CompactBins
         |  AS target FROM sh),
         |nf AS (
         |  SELECT rn, shard, n_docs, n_chars, CAST(0 AS BIGINT) AS bin,
         |    n_chars AS fill
         |  FROM ord WHERE rn = 1
         |  UNION ALL
         |  SELECT o.rn, o.shard, o.n_docs, o.n_chars,
         |    CASE WHEN nf.fill + o.n_chars > (SELECT target FROM tgt)
         |      THEN nf.bin + 1 ELSE nf.bin END,
         |    CASE WHEN nf.fill + o.n_chars > (SELECT target FROM tgt)
         |      THEN o.n_chars ELSE nf.fill + o.n_chars END
         |  FROM nf JOIN ord o ON o.rn = nf.rn + 1)
         |SELECT bin, count(*) AS n_shards,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM nf GROUP BY bin ORDER BY bin""".stripMargin
  )
}
