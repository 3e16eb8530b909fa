package graft

import org.scalatest.matchers.should.Matchers

/** The driver contract itself: registry integrity (Map ++ silently drops
  * colliding keys across modules), oracle coverage, and the smoke check the
  * driver performs on `entry`.
  */
class SparkEntrySpec extends SparkSpec with Matchers {

  test("query keys are collision-free across modules") {
    val moduleSizes = Seq(
      operators.Relational.queries.size,
      operators.TpcH.queries.size,
      operators.TextAnalysis.queries.size,
      operators.Dedup.queries.size,
      operators.Similarity.queries.size,
      operators.Events.queries.size,
      operators.Multimodal.queries.size,
      operators.Sampling.queries.size,
      operators.Embeddings.queries.size,
      operators.Bpe.queries.size,
      operators.Graph.queries.size,
      operators.GlobalOrder.queries.size,
      scale.Scale.queries.size,
      sources.Export.queries.size,
      sources.Ingest.queries.size,
      streaming.Streaming.queries.size,
      operators.Hosts.queries.size,
      operators.SqlSurface.queries.size,
      1) // wc_wordcount
    SparkEntry.queries.size shouldBe moduleSizes.sum
  }

  test("every oracle key has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    (o -- q) shouldBe empty
    // full oracle coverage is this engine's bar: no rows-only checks
    (q -- o) shouldBe empty
  }

  test("driver smoke contract: entry returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query's output schema uses only oracle-safe types") {
    import org.apache.spark.sql.types._
    // SCALARS ONLY: the driver's harness sorts rows by all columns in
    // pandas before hashing, and ndarray cells are unhashable — round 2's
    // two errored queries were exactly array-typed output columns.
    // Collections must leave stringified (array_join — the q_complex_types
    // convention).
    val allowed: Set[DataType] =
      Set(LongType, DoubleType, StringType, BooleanType, TimestampType,
        TimestampNTZType,
        // DATE where DuckDB emits DATE (date_trunc('day'/'month')) — the
        // dtype-strict gate proved parity; a Spark TIMESTAMP there is the
        // mismatch the round-2 gate hardening caught
        DateType)
    for ((name, fn) <- SparkEntry.queries) {
      val schema = fn(spark, sf()).schema
      withClue(s"$name: ") {
        schema.fieldNames.toSeq.distinct.size shouldBe schema.size // no dup names
        schema.fields.foreach { f =>
          withClue(s"column ${f.name} (${f.dataType.catalogString}): ") {
            allowed should contain(f.dataType)
          }
        }
      }
    }
  }

  test("oracle SQL strings are DuckDB-parseable (no stray interpolation)") {
    // cheap structural sanity: balanced quotes, non-empty, mentions a table
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(s"$name: ") {
        sql.trim should not be empty
        sql.count(_ == '\'') % 2 shouldBe 0
      }
    }
  }
}
