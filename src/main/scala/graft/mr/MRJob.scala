package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._

/** The reference engine's currency: a string key/value pair.
  *
  * Reference: `mapreduce/mapreduce.go:44-47` — `KeyValue{Key, Value string}`.
  * Here it is a case class with a Catalyst `Encoder`, so a `Dataset[KeyValue]`
  * stores rows as Tungsten `UnsafeRow`s (not JSON lines as the reference's
  * shuffle format does, `mapreduce.go:156-164`).
  */
final case class KeyValue(key: String, value: String)

/** Job spec — mirrors `mapreduce/job.go:5-11` (`NMap`, `NReduce`, `InputPath`)
  * plus the output path the reference derives from the input name
  * (`mapreduce.go:221-225`).
  *
  * In Spark, `nMap` maps to input-split parallelism (`minPartitions` hint) and
  * `nReduce` to shuffle partitioning. Both are *hints*: at 100 TB, AQE should
  * own the shuffle partition count, so `nReduce <= 0` means "let Spark decide".
  */
final case class JobSpec(
    inputPath: String,
    outputPath: String,
    nMap: Int = 0,
    nReduce: Int = 0)

/** Spark-native re-expression of the reference's two-slot MapReduce dataflow.
  *
  * The reference's whole API is two higher-order function slots
  * (`mapreduce.go:131` Map, `:179` Reduce) run over a text file with a
  * hash-partition shuffle between them, producing a key-sorted TSV file
  * (`mapreduce.go:229-266`). We express that contract as:
  *
  *   - Map:   `String => IterableOnce[KeyValue]`  — a flatMap-shaped UDTF.
  *     The reference hands Map a *whole split* (`mapreduce.go:143-149`); we
  *     hand it a line. For line-tokenizing Maps (like word count) the two are
  *     observably identical (SURVEY §2.3.4); `runMapPartitions` exposes the
  *     whole-partition variant for closures that genuinely need it.
  *   - Reduce: either holistic `(String, Iterator[String]) => String`
  *     (parity with `mapreduce.go:180-216`: all values of a key materialize)
  *     or an algebraic [[Aggregator]] — which the reference *lacks* (no
  *     combiner, OSDI'04 §4.3) and which is the only shape that scales:
  *     partial aggregation keeps shuffle volume O(distinct keys), not O(rows).
  *
  * Scale notes (100 TB):
  *   - the holistic path (`groupByKey.mapGroups`) materializes one key's
  *     values on one task — same skew hazard as the reference; the docs steer
  *     users to the Aggregator path, which Spark turns into partial+final
  *     `HashAggregateExec` with spill.
  *   - the single-file sorted TSV sink (`coalesce(1)`) is the reference's
  *     contract (`mapreduce.go:256`), kept as an opt-in mode; `sortedOutput`
  *     with `coalesce = false` writes a range-partitioned globally-sorted
  *     directory instead, which is the form that survives at scale.
  */
object MRJob {

  /** Read the job input as a line Dataset. The reference's `Split`
    * (`mapreduce.go:74-112`) chunks on line boundaries; Spark's text source
    * does the same natively, with `nMap` as a minimum-split hint.
    */
  def readLines(spark: SparkSession, job: JobSpec): Dataset[String] = {
    import spark.implicits._
    // same default line-separator handling in both branches — a pinned
    // lineSep only here would make CRLF input tokenize differently
    // depending on whether nMap was hinted
    val df = spark.read.textFile(job.inputPath)
    (if (job.nMap > 0) df.repartition(job.nMap) else df).as[String]
  }

  /** The mapped-and-shuffle-ready pairs: Map applied per line, then (only if
    * the caller pinned `nReduce`) hash-repartitioned by key — the Spark
    * equivalent of `DoMap`'s `fnv32a(key) % nReduce` fan-out
    * (`mapreduce.go:155-166`). Partition assignment is invisible in the final
    * output (SURVEY §2.3.3) so Murmur3 replaces fnv32a.
    */
  def mapped(
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue]): Dataset[KeyValue] = {
    import spark.implicits._
    val kv = readLines(spark, job).flatMap(map)
    if (job.nReduce > 0) kv.repartition(job.nReduce, $"key") else kv
  }

  /** Holistic reduce — exact parity with `DoReduce` (`mapreduce.go:178-219`):
    * the user function sees every value of a key. Values arrive in no
    * guaranteed order (same contract as the reference, SURVEY §2.3.2).
    * Prefer [[runAggregated]] for algebraic reduces.
    *
    * When `nReduce` is pinned, this is the literal DoReduce plan: ONE hash
    * shuffle into exactly nReduce partitions, a per-partition key sort
    * (`sort.Strings`, `mapreduce.go:203-207`), and a streaming walk over
    * consecutive key runs. (A `groupByKey` here would add a second shuffle
    * at the session partition count — its lambda key is opaque to Catalyst —
    * which both wastes I/O and ignores the knob.) Without `nReduce`, the
    * Catalyst-managed `groupByKey` path lets AQE size the reduce stage.
    */
  def runHolistic(
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue],
      reduce: (String, Iterator[String]) => String): Dataset[KeyValue] =
    reduceStage(readLines(spark, job).flatMap(map)(kvEncoder(spark)), job, reduce)

  /** The shared reduce stage (see [[runHolistic]] for the plan rationale). */
  private def reduceStage(
      kv: Dataset[KeyValue],
      job: JobSpec,
      reduce: (String, Iterator[String]) => String): Dataset[KeyValue] = {
    val spark = kv.sparkSession
    import spark.implicits._
    if (job.nReduce > 0)
      kv.repartition(job.nReduce, $"key")
        .sortWithinPartitions($"key")
        .mapPartitions(reduceRuns(_, reduce))
    else
      kv.groupByKey(_.key)
        .mapGroups((k, vs) => KeyValue(k, reduce(k, vs.map(_.value))))
  }

  private def kvEncoder(spark: SparkSession): Encoder[KeyValue] = {
    import spark.implicits._
    implicitly[Encoder[KeyValue]]
  }

  /** Reduce consecutive same-key runs of a key-sorted partition — keys are
    * disjoint across partitions after the hash repartition (SURVEY §2.3.3),
    * so per-partition runs are complete key groups.
    */
  private def reduceRuns(
      it: Iterator[KeyValue],
      reduceFn: (String, Iterator[String]) => String): Iterator[KeyValue] = {
    val buf = it.buffered
    new Iterator[KeyValue] {
      def hasNext: Boolean = buf.hasNext
      def next(): KeyValue = {
        val key = buf.head.key
        // stream the run to the reduce (no per-key materialization — a
        // hot key's values must not all buffer in memory); drain whatever
        // the reduce did not consume before moving to the next run
        val values = new Iterator[String] {
          def hasNext: Boolean = buf.hasNext && buf.head.key == key
          def next(): String = buf.next().value
        }
        val out = KeyValue(key, reduceFn(key, values))
        while (values.hasNext) values.next()
        out
      }
    }
  }

  /** Algebraic reduce via a typed [[Aggregator]] — unlocks map-side partial
    * aggregation (the combiner the reference is missing; its shuffle carries
    * one JSON record per *occurrence*, `mapreduce.go:156-164`).
    */
  def runAggregated[B: Encoder, O](
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue],
      agg: Aggregator[KeyValue, B, O])(implicit
      oe: Encoder[(String, O)]): Dataset[(String, O)] = {
    import spark.implicits._
    mapped(spark, job, map).groupByKey(_.key).agg(agg.toColumn)
  }

  /** Whole-partition Map variant for closures that need more than a line —
    * the reference hands Map the entire split text (`mapreduce.go:143-149`).
    */
  def runMapPartitions(
      spark: SparkSession,
      job: JobSpec,
      map: Iterator[String] => Iterator[KeyValue],
      reduce: (String, Iterator[String]) => String): Dataset[KeyValue] =
    reduceStage(
      readLines(spark, job).mapPartitions(map)(kvEncoder(spark)), job, reduce)

  /** Whole-split Map SHAPE — Map receives its split as ONE string, the
    * reference's call shape (`mapreduce.go:143-149` reads the whole split
    * file into memory before calling Map). NOT byte-faithful to the
    * reference: chunk = this partition's lines re-joined with "\n" (CR of
    * CRLF input and the trailing newline are normalized away), and with
    * `nMap` pinned the repartition makes a chunk a round-robin line
    * subset, not a contiguous byte range. For Maps that decompose per
    * line, all such chunkings are observably identical (SURVEY §2.3.4 —
    * pinned across nMap values by WordCountSpec); a Map that is sensitive
    * to CRLF bytes, line adjacency, or chunk contiguity needs a custom
    * byte-range input format instead (docs/NEXT.md).
    */
  def runWholeSplit(
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue],
      reduce: (String, Iterator[String]) => String): Dataset[KeyValue] =
    runMapPartitions(spark, job,
      it => if (it.isEmpty) Iterator.empty
            else map(it.mkString("\n")).iterator,
      reduce)

  /** Byte-faithful re-expression of the reference's `Split`
    * (`mapreduce.go:74-112`): chunk m's text is EXACTLY the bytes of the
    * reference's `mrtmp.<file>-<m>` split file.
    *
    * Reference semantics reproduced here:
    *   - lines are scanner-normalized: the trailing `\n` (and a preceding
    *     `\r`, i.e. CRLF) is stripped, then `"\n"` is appended — so EVERY
    *     line, including an unterminated last line, contributes
    *     `bytes(line) + 1`;
    *   - `nchunk = fileSize/nMap + 1` (original on-disk size, CRs included);
    *   - a new chunk starts when cumulative normalized bytes `i` exceed
    *     `nchunk·m` — checked before each line, so chunks are CONTIGUOUS
    *     line runs, not round-robin subsets.
    *
    * Scale shape: the cumulative-bytes rule is a prefix sum, computed
    * distributedly — pass 1 aggregates one (bytes, lines, maxLine) triple
    * per partition (a bounded, partition-count-sized collect, never
    * data-proportional), pass 2 assigns each line its chunk with a
    * partition-local running offset. The closed-form chunk id
    * `(i-1)/nchunk` equals the reference's sequential walk whenever no
    * single line exceeds `nchunk` bytes (the walk advances at most one
    * chunk per line); pass 1's maxLine guards that precondition and this
    * method fails loudly if it is violated.
    */
  def splitChunks(
      spark: SparkSession, job: JobSpec): Dataset[(Long, String)] = {
    require(job.nMap > 0, "splitChunks needs an explicit nMap (reference Split contract)")
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(job.inputPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val size = fs.getFileStatus(path).getLen
    val nchunk = size / job.nMap + 1

    // Hadoop's line reader applies the same CR?LF normalization as Go's
    // bufio.Scanner, so a line's normalized contribution is bytes + 1.
    // (Sole divergence: a LONE \r terminates a line for Hadoop but not for
    // Go's ScanLines — out of contract for line-oriented text input.)
    val lines = spark.sparkContext.textFile(job.inputPath, job.nMap)
    def lineBytes(l: String): Long =
      l.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1L

    // pass 1: per-partition (bytes, maxLine) — bounded driver roundtrip
    val partStats = lines
      .mapPartitionsWithIndex { (pi, it) =>
        var bytes = 0L; var maxLine = 0L
        it.foreach { l => val b = lineBytes(l); bytes += b; maxLine = math.max(maxLine, b) }
        Iterator((pi, bytes, maxLine))
      }
      .collect()
      .sortBy(_._1)
    val maxLine = if (partStats.isEmpty) 0L else partStats.map(_._3).max
    require(maxLine <= nchunk,
      s"a single line ($maxLine bytes) exceeds the chunk size ($nchunk): " +
        "the reference's one-chunk-per-line advance cannot be reproduced " +
        "in closed form — raise nMap or pre-split the input")
    val partStarts = partStats.map(_._2).scanLeft(0L)(_ + _)

    // pass 2: chunk id from the closed form over the running byte offset;
    // the (global) line index orders lines within a chunk for reassembly
    val linesPerPart = spark.sparkContext.broadcast(partStarts)
    val assigned = lines
      .mapPartitionsWithIndex { (pi, it) =>
        var i = linesPerPart.value(pi)
        it.map { l =>
          val chunk = if (i == 0L) 0L else (i - 1) / nchunk
          val off = i
          i += lineBytes(l)
          (chunk, off, l) // (chunk, offset-before-line, line)
        }
      }
      .toDF("chunk_id", "off", "line")

    // reassemble each chunk in offset order; every line contributes a
    // trailing "\n" (scanner parity), so the chunk is mkString + "\n"
    assigned
      .groupBy(col("chunk_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("off"), col("line")))),
          s => concat(s.getField("line"), lit("\n"))),
        "").as("text"))
      .as[(Long, String)]
  }

  /** Whole-split Map with BYTE-FAITHFUL reference chunking: Map receives
    * chunk strings identical to the reference's split files
    * (`mapreduce.go:143-149` reads the whole split into one string), via
    * [[splitChunks]]. Use when a Map closure is sensitive to chunk
    * contiguity or the trailing newline; for per-line Maps,
    * [[runWholeSplit]]'s partition-shaped chunks are observably identical
    * and avoid the extra pass.
    */
  def runWholeSplitContiguous(
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue],
      reduce: (String, Iterator[String]) => String): Dataset[KeyValue] = {
    import spark.implicits._
    reduceStage(
      splitChunks(spark, job).flatMap { case (_, text) => map(text) },
      job, reduce)
  }

  /** The reference's output contract (SURVEY §2.3.1): lines `key\tvalue`,
    * ascending bytewise key order, one file (`mapreduce.go:251-263`).
    *
    * `singleFile = true` reproduces it exactly (`orderBy` then `coalesce(1)`)
    * — correct, but a deliberate scale bottleneck, so it is opt-in.
    * `singleFile = false` writes a globally-sorted *directory*: `orderBy` is
    * a range-partitioned sort, so concatenating part files in name order
    * yields the same total order — the form that works at 100 TB.
    */
  def writeSortedTsv(
      result: Dataset[KeyValue],
      outputPath: String,
      singleFile: Boolean = false): Unit = {
    val spark = result.sparkSession
    import spark.implicits._
    val sorted = result
      .orderBy($"key")
      .select(concat_ws("\t", $"key", $"value").as("value"))
    (if (singleFile) sorted.coalesce(1) else sorted).write
      .mode("overwrite")
      .text(outputPath)
  }

  /** `RunSequential` parity (`mapreduce.go:288-301`): same operator code path
    * as any cluster run — only the master URL differs, preserving the
    * reference's local/distributed symmetry (SURVEY §4.2 last row).
    */
  def runSequential(
      spark: SparkSession,
      job: JobSpec,
      map: String => IterableOnce[KeyValue],
      reduce: (String, Iterator[String]) => String,
      singleFile: Boolean = true): Unit =
    writeSortedTsv(runHolistic(spark, job, map, reduce), job.outputPath, singleFile)
}
