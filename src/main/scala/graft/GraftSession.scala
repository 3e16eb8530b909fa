package graft

import org.apache.spark.sql.SparkSession

import graft.functions.VectorExpressions
import graft.tables.Tables

/** SQL front door: one call registers the corpus tables as temp views and
  * the engine's native functions (`vec_dot`, `vec_cosine`) in the session's
  * function registry, so the full surface is reachable from `spark.sql`:
  *
  * {{{
  * GraftSession.init(spark, "/root/testdata/sf0.01")
  * spark.sql("""
  *   SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1""")
  * spark.sql("""
  *   SELECT a.vec_id, b.vec_id, vec_cosine(a.embedding, b.embedding) c
  *   FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id""")
  * }}}
  *
  * The reference exposes no SQL at all (SURVEY §4.1) — this is north-star
  * surface; temp views keep it catalog-free and zero-copy (views are plans,
  * not materializations; pushdown still reaches the parquet scans).
  */
object GraftSession {
  def init(spark: SparkSession, sfDir: String): Unit = {
    // events goes through its dedicated loader (TIMESTAMP(NANOS)
    // normalization); a plain read of that file throws at schema inference
    Tables.names.filterNot(_ == "events").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    VectorExpressions.register(spark)
  }
}
