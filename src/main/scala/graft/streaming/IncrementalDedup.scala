package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** INCREMENTAL near-duplicate detection — maintain duplicate clusters as
  * documents ARRIVE, instead of recomputing the batch pipeline per corpus
  * snapshot. The batch shape ([[graft.operators.Dedup.qDedupPipeline]]) is
  * MinHash → LSH bands → candidate pairs → Jaccard verify → connected
  * components; the streaming twin keeps the signature/banding stage
  * IDENTICAL (the same codegen expressions on an unbounded DataFrame —
  * Catalyst plans them incrementally) and replaces the band-bucket
  * aggregation with per-bucket STATE: each (band_idx, band_key) group holds
  * its admitted members' hashed-shingle sets, and a newly arriving document
  * is verified against exactly the members it shares a band with — emitting
  * a duplicate edge the moment the pair exists, years of corpus later or
  * one micro-batch later.
  *
  * Equivalence to batch (proven in IncrementalDedupSpec over random arrival
  * orders and micro-batch splits): for any corpus whose band buckets stay
  * within `maxBucket`, the verified edge SET equals the batch pipeline's,
  * so the transitive closure — the clusters — is identical regardless of
  * arrival order. The one deliberate divergence: the batch cap drops an
  * over-cap bucket RETROACTIVELY (it sees final bucket sizes); a stream
  * cannot un-emit, so the cap here is admission control — the first
  * `maxBucket` arrivals per bucket participate, later ones are ignored for
  * that band. Both enforce the same 100 TB property (no quadratic pair
  * generation inside a degenerate bucket); they differ only on WHICH pairs
  * of an over-cap bucket survive.
  *
  * Scale design: state per bucket is ≤ maxBucket members × |hs| longs, keyed
  * by band key and hash-partitioned across executors like any keyed state;
  * per-arrival work is O(bucket members) verifications, so total cost is
  * candidate-density-proportional — the same bill as batch. State here never
  * expires (clusters are forever); a production deployment with bounded
  * retention would add an event-time timeout per bucket, which bounds state
  * by the watermark at the price of missing duplicates farther apart than
  * the retention window ([[Streaming.dedupByFingerprint]] makes the same
  * trade for exact dedup).
  */
object IncrementalDedup {

  /** One document's membership in one LSH band bucket. */
  final case class BandRow(doc_id: Long, hs: Seq[Long], band_idx: Int, band_key: String)

  /** Admitted bucket member retained in state. */
  final case class BandMember(doc_id: Long, hs: Seq[Long])

  /** A verified duplicate pair, src < dst. */
  final case class DupEdge(src: Long, dst: Long)

  /** Signature + banding for a (doc_id, text, *carry) DataFrame, hs
    * retained for the verify stage — the SAME expressions as the batch
    * [[graft.operators.Dedup.minhashBanded]] (affine MinHash over 60-bit
    * hashed 3-gram shingles, md5 band keys), so stream and batch band
    * assignments are bit-identical. Works on bounded and unbounded inputs
    * alike: every step is a narrow projection (carried columns ride along —
    * no join, which on a stream would be a stateful stream-stream join).
    */
  private def banded(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val tk = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
    val sig = docs
      .withColumn("hs", graft.functions.SketchExpressions.md5Prefix60(
        graft.functions.SketchExpressions.wordNGrams(tk, 3)))
      .filter(size(col("hs")) > 0)
      .withColumn("mh",
        graft.functions.SketchExpressions.affineMinhashes(col("hs"), Dedup.NumHashes))
    val bandCols = (0 until Dedup.NumBands).map { b =>
      val ms = (0 until Dedup.RowsPerBand)
        .map(r => element_at(col("mh"), b * Dedup.RowsPerBand + r + 1))
      struct(lit(b).as("band_idx"), md5(concat_ws(",", ms: _*)).as("band_key"))
    }
    val keep = Seq(col("doc_id"), col("hs")) ++ carry.map(col)
    sig
      .select(keep :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(keep :+ col("bk.band_idx").as("band_idx")
        :+ col("bk.band_key").as("band_key"): _*)
  }

  /** Banding for a (doc_id, text) stream — rows bind to [[BandRow]]. */
  def bandedSignatures(docs: DataFrame): DataFrame = banded(docs, Nil)

  /** Banding for a (doc_id, text, ts) stream — rows bind to
    * [[TimedBandRow]]; `ts` rides the projection so the caller's watermark
    * survives into the stateful stage.
    */
  def bandedSignaturesWithTs(docs: DataFrame): DataFrame =
    banded(docs, Seq("ts"))

  /** Exact Jaccard over hashed-shingle sets — the verify metric of the
    * batch pipeline (identical md5 hashing both sides, so collisions — and
    * therefore values — agree).
    */
  private[streaming] def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Stateful per-bucket pair generation + verification: emits each
    * verified edge (j >= threshold) the first time its pair shares a band.
    * Within a micro-batch, a bucket's arrivals are processed in doc_id
    * order so admission under the cap is deterministic for the
    * batch-equivalence proof (micro-batch boundaries already impose an
    * order between batches; this pins the order within one).
    *
    * The same pair may emit from several bands (batch counts shared bands
    * instead) and, across restarts, state replay keeps emission
    * at-least-once — consumers must be idempotent, which the union-find
    * [[ClusterStore]] is by construction.
    */
  def incrementalEdges(
      banded: DataFrame,
      threshold: Double = Dedup.JaccardThreshold,
      maxBucket: Int = Dedup.MaxLshBucket): Dataset[DupEdge] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.as[BandRow]
      .groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState[List[BandMember], DupEdge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[List[BandMember]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupEdge]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (members.size < maxBucket && !members.exists(_.doc_id == r.doc_id)) {
              members.foreach { m =>
                if (jaccard(m.hs, r.hs) >= threshold)
                  out += DupEdge(math.min(m.doc_id, r.doc_id), math.max(m.doc_id, r.doc_id))
              }
              members = BandMember(r.doc_id, r.hs) :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  /** One derived-line instance of an arriving document. */
  final case class LineRow(doc_id: Long, line_no: Int, h: Long)

  /** A first-claim decision for one line instance. */
  final case class LineClaim(doc_id: Long, line_no: Int, h: Long, kept: Boolean)

  /** INCREMENTAL line-level dedup — the streaming twin of
    * [[graft.operators.Dedup.qDedupLinesKeep]]'s keep-first policy: as
    * documents arrive, the FIRST instance of each distinct line claims
    * it; every later instance (any document, any micro-batch, years
    * apart) is marked dropped. Feed it
    * `Dedup.lineRows(docStream)` — the identical chunk+hash expressions
    * as batch, so stream and batch agree on what "the same line" is.
    *
    * Equivalence (IncrementalDedupSpec): for ANY arrival order, exactly
    * one instance per distinct line is kept — Σ kept = the batch distinct
    * count; and when micro-batches respect document order, the kept set
    * is bit-identical to the batch transform's (which resolves first
    * occurrence as min(doc_id, line_no)). Within a micro-batch, a
    * group's arrivals are processed in (doc_id, line_no) order so the
    * claim is deterministic.
    *
    * Scale: state is ONE BOOLEAN per distinct line hash, keyed and
    * hash-partitioned like any streaming state — the same cardinality a
    * batch `distinct` shuffles, amortized over the stream's lifetime.
    * Claims emit in Append mode, so downstream per-doc aggregation runs
    * in the sink (foreachBatch MERGE), as with the edge stream.
    */
  def incrementalLineClaims(lines: DataFrame): Dataset[LineClaim] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.as[LineRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, LineClaim](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: Long, rows: Iterator[LineRow], state: GroupState[Boolean]) =>
          var claimed = state.getOption.getOrElse(false)
          val out = List.newBuilder[LineClaim]
          rows.toSeq.sortBy(r => (r.doc_id, r.line_no)).foreach { r =>
            out += LineClaim(r.doc_id, r.line_no, h, kept = !claimed)
            claimed = true
          }
          if (claimed && !state.exists) state.update(true)
          out.result().iterator
      }
  }

  /** One derived-line instance with its event time. */
  final case class TimedLineRow(doc_id: Long, line_no: Int, h: Long,
      ts: java.sql.Timestamp)

  /** Live-claim state for [[incrementalLineClaimsWithRetention]]: the
    * claim's last activity, refreshed by every arrival of the line (a
    * line that keeps re-appearing stays claimed — same liveness rule as
    * [[TimedBucket]]).
    */
  final case class TimedClaim(lastMs: Long)

  /** RETENTION-BOUNDED first-claim line dedup — the production trade for
    * an infinite line stream: [[incrementalLineClaims]] state is one entry
    * per distinct line EVER SEEN (claims are forever, the backfill
    * semantics), while this variant expires a claim once the watermark
    * passes `retention` beyond the line's last arrival. Within the window
    * duplicates are still dropped; a line idle longer than `retention` is
    * RE-ADMITTED by construction (its next instance is kept again) — the
    * same bounded-state trade as [[incrementalEdgesWithRetention]], with
    * the same consequence spelled out: total state is arrival rate ×
    * retention, not stream history. Callers watermark `ts` upstream of
    * [[lineRowsWithTs]].
    */
  def incrementalLineClaimsWithRetention(
      lines: DataFrame,
      retention: java.time.Duration): Dataset[LineClaim] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val retMs = retention.toMillis
    lines.as[TimedLineRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState[TimedClaim, LineClaim](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: Long, rows: Iterator[TimedLineRow], state: GroupState[TimedClaim]) =>
          if (state.hasTimedOut) {
            state.remove() // claim lapsed: the next instance is kept again
            Iterator.empty
          } else {
            var claim = state.getOption
            val out = List.newBuilder[LineClaim]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id, r.line_no)).foreach { r =>
              out += LineClaim(r.doc_id, r.line_no, h, kept = claim.isEmpty)
              claim = Some(TimedClaim(math.max(
                claim.map(_.lastMs).getOrElse(0L), r.ts.getTime)))
            }
            claim.foreach { c =>
              state.update(c)
              // strictly beyond the current watermark or Spark rejects it
              state.setTimeoutTimestamp(
                math.max(c.lastMs + retMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** [[graft.operators.Dedup.lineRows]] with the event-time column carried
    * through — identical chunk+hash expressions, so the retention variant
    * hashes lines bit-identically to batch.
    */
  def lineRowsWithTs(docs: DataFrame): DataFrame =
    Dedup.lineRowsTs(docs)

  /** Incrementally-maintained duplicate clusters: a driver-side union-find
    * MERGE target for the edge stream (the in-memory stand-in for a keyed
    * store, same pattern as [[Streaming.AttributionStore]]). Union is
    * commutative/associative/idempotent, so duplicate edge emissions,
    * batch boundaries, and arrival order are all absorbed — the snapshot
    * after any prefix of arrivals equals the batch closure over the edges
    * seen so far.
    */
  final class ClusterStore {
    import scala.collection.mutable
    private val parent = mutable.Map.empty[Long, Long]

    private def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }

    def merge(edges: DataFrame): Unit = {
      val batch = edges.collect()
      parent.synchronized {
        batch.foreach { row =>
          val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
          if (a != b) parent(math.max(a, b)) = math.min(a, b)
          parent.getOrElseUpdate(math.min(a, b), math.min(a, b))
        }
      }
    }

    /** doc_id → component minimum, for every doc that appeared in an edge —
      * the same contract as [[graft.operators.ConnectedComponents.components]].
      */
    def snapshot: Map[Long, Long] = parent.synchronized {
      parent.keys.map(k => k -> find(k)).toMap
    }
  }

  /** Fully DISTRIBUTED incremental closure — the scale path past
    * [[ClusterStore]], whose union-find lives in driver memory (fine while
    * the duplicate-cluster node set fits on the driver; a 100 TB corpus'
    * duplicate population does not). State is a persisted
    * (id, component) star-forest DataFrame. Each micro-batch's edges are
    * unioned with the previous forest re-expressed as (component → id)
    * edges and re-closed with the alternating-star algorithm
    * ([[graft.operators.ConnectedComponents]]): a star forest carries the
    * same partition as the original edge prefix and its labels are member
    * minima, so the re-closure equals the batch closure over every edge
    * seen so far — the same invariant the union-find maintains, with no
    * driver-side collection anywhere. Since the prior state is already a
    * star forest, each merge converges in O(log²(batch)) rounds over
    * |state| + |batch| edges, not the full history's edge count.
    *
    * Incremental cost note: the re-closure rescans the whole forest per
    * compaction. `closeEvery` amortizes it — edge batches accumulate
    * (localCheckpointed, since a foreachBatch frame is only valid inside
    * its call) and the closure runs once per N merges and lazily on any
    * `mapping`/`snapshot` read, so reads always see every merged edge.
    *
    * Fault-tolerance trade (deliberate, test-scale): state lineage is
    * truncated via `localCheckpoint`, whose blocks live on executors
    * WITHOUT replication — an executor loss mid-stream loses cluster state
    * permanently (the stream fails rather than silently recomputing
    * wrong). A production deployment swaps the persisted frame for a
    * reliably-stored MERGE target (Delta table / `checkpoint` on a
    * replicated FS) with identical semantics; nothing in the algorithm
    * depends on the storage being local.
    */
  final class DistributedClusterStore(
      spark: org.apache.spark.sql.SparkSession, closeEvery: Int = 1) {
    require(closeEvery >= 1, s"closeEvery must be >= 1, got $closeEvery")
    private var state: Option[DataFrame] = None
    private var pending: Option[DataFrame] = None
    private var pendingBatches = 0

    def merge(edges: DataFrame): Unit = synchronized {
      val newEdges = edges
        .select(col("src"), col("dst"))
        .where(col("src") =!= col("dst"))
        .localCheckpoint()
      pending = Some(pending.map(_.union(newEdges)).getOrElse(newEdges))
      pendingBatches += 1
      if (pendingBatches >= closeEvery) close()
    }

    /** Re-close state ∪ pending; callers hold the lock. */
    private def close(): Unit = {
      pending.foreach { p =>
        val all = state match {
          case Some(m) =>
            p.union(
              m.where(col("id") =!= col("component"))
                .select(col("component").as("src"), col("id").as("dst")))
          case None => p
        }
        if (!all.isEmpty) {
          val next = graft.operators.ConnectedComponents.components(all).persist()
          next.count() // materialize before releasing the predecessor's blocks
          state.foreach(_.unpersist(blocking = false))
          state = Some(next)
        }
      }
      pending = None
      pendingBatches = 0
    }

    /** Live (id, component) mapping — the distributed product; flushes any
      * pending batches first, so reads always reflect every merged edge.
      * Empty frame before any edge arrives. Returned as an eager
      * localCheckpoint SNAPSHOT with self-contained storage: a later
      * merge()+close() unpersists the internal state it was derived from,
      * which must not invalidate a frame a caller is still consuming.
      */
    def mapping: DataFrame = synchronized {
      close()
      state match {
        case Some(m) => m.localCheckpoint(eager = true)
        case None =>
          import spark.implicits._
          Seq.empty[(Long, Long)].toDF("id", "component")
      }
    }

    /** Driver-side view for tests/small corpora (collects the mapping). */
    def snapshot: Map[Long, Long] =
      mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Wire docs → banding → stateful verify → DISTRIBUTED closure; returns
    * the started query. `store.mapping` is the live cluster mapping as a
    * DataFrame.
    */
  def runDistributed(docs: DataFrame, store: DistributedClusterStore,
      threshold: Double = Dedup.JaccardThreshold,
      maxBucket: Int = Dedup.MaxLshBucket)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incrementalEdges(bandedSignatures(docs), threshold, maxBucket)
      .toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => store.merge(batch) }
      .start()

  /** Wire docs → banding → stateful verify → union-find store; returns the
    * started query. `store.snapshot` is the live cluster mapping.
    */
  def run(docs: DataFrame, store: ClusterStore,
      threshold: Double = Dedup.JaccardThreshold,
      maxBucket: Int = Dedup.MaxLshBucket)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incrementalEdges(bandedSignatures(docs), threshold, maxBucket)
      .toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => store.merge(batch) }
      .start()

  /** [[BandRow]] plus the document's event time, for the retention
    * variant.
    */
  final case class TimedBandRow(doc_id: Long, hs: Seq[Long], band_idx: Int,
      band_key: String, ts: java.sql.Timestamp)

  /** Retained bucket state for [[incrementalEdgesWithRetention]]. */
  final case class TimedBucket(members: List[BandMember], lastMs: Long)

  /** RETENTION-BOUNDED incremental dedup — the production trade for an
    * infinite stream: [[incrementalEdges]] keeps every bucket forever
    * (state grows with distinct content), while this variant expires a
    * bucket once the watermark passes `retention` beyond its last arrival,
    * via event-time timeout. Duplicates arriving within `retention` of the
    * bucket's previous activity are still found; a pair farther apart than
    * the retention window is MISSED by construction — the same bounded-
    * state trade [[Streaming.dedupByFingerprint]] makes for exact dedup
    * (and the reason the unbounded variant exists for backfills, where
    * "state" is just the corpus). State: ≤ maxBucket members per LIVE
    * bucket, so total state is bounded by arrival rate × retention, not by
    * corpus history.
    *
    * Callers must put a watermark on `ts` BEFORE the banding stage they
    * pass in (see [[runWithRetention]]); the timeout timestamp is
    * last-arrival + retention.
    */
  def incrementalEdgesWithRetention(
      banded: DataFrame,
      retention: java.time.Duration,
      threshold: Double = Dedup.JaccardThreshold,
      maxBucket: Int = Dedup.MaxLshBucket): Dataset[DupEdge] = {
    val spark = banded.sparkSession
    import spark.implicits._
    val retMs = retention.toMillis
    banded.as[TimedBandRow]
      .groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState[TimedBucket, DupEdge](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[TimedBandRow], state: GroupState[TimedBucket]) =>
          if (state.hasTimedOut) {
            // bucket idle past retention: drop it; a future duplicate of
            // its content re-opens an empty bucket (and misses the pair)
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(TimedBucket(Nil, 0L))
            var members = prev.members
            var lastMs = prev.lastMs
            val out = List.newBuilder[DupEdge]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
              if (members.size < maxBucket && !members.exists(_.doc_id == r.doc_id)) {
                members.foreach { m =>
                  if (jaccard(m.hs, r.hs) >= threshold)
                    out += DupEdge(math.min(m.doc_id, r.doc_id),
                      math.max(m.doc_id, r.doc_id))
                }
                members = BandMember(r.doc_id, r.hs) :: members
              }
              lastMs = math.max(lastMs, r.ts.getTime)
            }
            state.update(TimedBucket(members, lastMs))
            // strictly beyond the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(lastMs + retMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** Wire a (doc_id, text, ts) stream through watermark → banding →
    * retention-bounded verify → union-find store.
    */
  def runWithRetention(docs: DataFrame, store: ClusterStore,
      retention: java.time.Duration,
      watermarkDelay: String = "0 seconds",
      threshold: Double = Dedup.JaccardThreshold,
      maxBucket: Int = Dedup.MaxLshBucket)
      : org.apache.spark.sql.streaming.StreamingQuery =
    incrementalEdgesWithRetention(
      bandedSignaturesWithTs(docs.withWatermark("ts", watermarkDelay)),
      retention, threshold, maxBucket)
      .toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => store.merge(batch) }
      .start()
}
