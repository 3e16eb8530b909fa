package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class HostsSpec extends SparkSpec with Matchers {

  test("q_host_ledger: skewed derived hosts, blocked hosts zeroed, kept " +
    "capped at HostCap") {
    val rows = Hosts.qHostLedger(spark, sf()).collect()
    // light hosts (P(h00) = 1/1024) may be empty at sf0.001
    rows.length should (be <= Hosts.HostCount and be >= Hosts.HostCount - 3)
    val byHost = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // mass is skewed: the heaviest host carries many times the lightest
    val counts = rows.map(_.getLong(1))
    counts.max.toDouble / counts.min.toDouble should be > 5.0
    byHost.foreach { case (host, (n, blocked, kept)) =>
      val hid = host.stripPrefix("h").toInt
      blocked shouldBe (if (Hosts.Blocklist.contains(hid)) 1L else 0L)
      kept shouldBe (if (blocked == 1L) 0L else math.min(n, Hosts.HostCap))
    }
    // total docs conserved
    rows.map(_.getLong(1)).sum shouldBe
      graft.tables.Tables.documents(spark, sf()).count()
  }

  test("q_host_cap: keeps exactly the first HostCap doc_ids per unblocked " +
    "host (min_k, no window)") {
    val kept = Hosts.qHostCap(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = Hosts.hosted(spark, sf()).select(col("doc_id"), col("host"),
      col("host_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = all
      .filterNot(t => Hosts.Blocklist.contains(t._3.toInt))
      .groupBy(_._2).toSeq
      .flatMap { case (h, docs) =>
        docs.map(_._1).sorted.take(Hosts.HostCap).map(d => (d, h)) }
      .sortBy(_._1)
    kept.toSeq shouldBe want
    // no blocked host survives
    kept.map(_._2.stripPrefix("h").toInt).toSet
      .intersect(Hosts.Blocklist.toSet) shouldBe empty
  }
}
