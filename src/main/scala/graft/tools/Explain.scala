package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump formatted physical plans for plan review:
  * `sbt "runMain graft.tools.Explain q1_agg q_join_shuffle ..."` (no args =
  * a standard headline set).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_filter_project", "q_join_broadcast",
        "q_join_shuffle", "q_sort_limit", "wc_wordcount", "q_dedup_minhash",
        "q_ann_ivf_kmeans", "q_window_dist", "q_sample_hash",
        "q_decontaminate", "q_lm_score", "q_ngram_novelty",
        "q_text_selfrepeat", "q_embedding_quantize", "q_events_sliding",
        "q_multimodal_frames")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
