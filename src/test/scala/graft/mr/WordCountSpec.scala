package graft.mr

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Word-count parity with the reference contract (SURVEY §2.3):
  * tokenize on non-letters, drop empties, no case folding, per-key count,
  * output sorted bytewise by key, `key\tvalue` lines.
  */
class WordCountSpec extends SparkSpec with Matchers {

  /** Independent brute-force word count (the oracle of SURVEY §5.4). */
  private def brute(text: String): Map[String, Int] =
    text
      .split(WordCount.TokenSep)
      .filter(_.nonEmpty)
      .groupBy(identity)
      .view
      .mapValues(_.length)
      .toMap

  test("golden: end-to-end file pipeline produces sorted TSV (wc.go contract)") {
    val in = Files.createTempFile("wc-in", ".txt")
    val out = Files.createTempDirectory("wc-out").resolve("res")
    // Mixed case (no folding), punctuation/digit separators, consecutive
    // separators, unicode letters, empty line, no trailing newline.
    Files.writeString(
      in,
      "the The THE!\ncafé café 123 foo,,bar\n\nfoo9bar end")
    WordCount.runFile(spark, in.toString, out.toString, singleFile = true)

    val files = out.toFile.listFiles.filter(_.getName.startsWith("part-"))
    files.length shouldBe 1 // singleFile contract: exactly one part file
    val lines = Files.readAllLines(files.head.toPath)
    lines.toArray.toSeq shouldBe Seq(
      "THE\t1",
      "The\t1",
      "bar\t2",
      "café\t2",
      "end\t1",
      "foo\t2",
      "the\t1")
  }

  test("MR closure path and declarative SQL path agree with brute force") {
    val text = "a b c a B. c? a-a\nz žluťoučký žluťoučký"
    val in = Files.createTempFile("wc-in2", ".txt")
    Files.writeString(in, text)
    val viaMr = WordCount
      .viaMR(spark, JobSpec(in.toString, ""))
      .collect()
      .map(kv => kv.key -> kv.value.toInt)
      .toMap
    viaMr shouldBe brute(text)

    import spark.implicits._
    val df = spark.createDataset(text.split("\n").toSeq).toDF("text")
    val viaSql = WordCount
      .viaSql(df, "text")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt)
      .toMap
    viaSql shouldBe brute(text)
  }

  test("property: both paths match brute force on random text") {
    val wordGen = Gen.oneOf("the", "Café", "a", "B", "žluť", "x1y")
    val sepGen = Gen.oneOf(" ", ", ", "  ", "!", "\n", " 42 ")
    val textGen = for {
      n <- Gen.choose(0, 60)
      ws <- Gen.listOfN(n, wordGen)
      ss <- Gen.listOfN(n, sepGen)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

    import spark.implicits._
    val texts = (0 until 15).flatMap(i =>
      textGen(Gen.Parameters.default, Seed(42L + i)).toSeq)
    texts should not be empty
    val df = spark.createDataset(texts).toDF("text")
    val got = WordCount
      .viaSql(df, "text")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt)
      .toMap
    got shouldBe brute(texts.mkString(" "))
  }

  test("reduce is order-insensitive (SURVEY §2.3.2) and aggregator agrees") {
    val values = Seq("1", "1", "1", "1", "1")
    WordCount.reduceFn("k", values.iterator) shouldBe
      WordCount.reduceFn("k", values.reverse.iterator)

    // Aggregator path (partial agg) over a shuffled dataset equals holistic.
    import spark.implicits._
    val in = Files.createTempFile("wc-in3", ".txt")
    Files.writeString(in, "x x y x y z")
    val agg = MRJob
      .runAggregated(spark, JobSpec(in.toString, ""), WordCount.mapFn, WordCount.sumAgg)
      .collect()
      .toMap
    agg shouldBe Map("x" -> 3L, "y" -> 2L, "z" -> 1L)
  }

  test("whole-split Map is chunking-invariant across nMap values (§2.3.4)") {
    val in = Files.createTempFile("wc-ws", ".txt")
    val text = (1 to 40).map(i => s"alpha beta Gamma$i alpha line$i").mkString("\n")
    Files.writeString(in, text)
    // the reference hands Map one whole split string; any line-respecting
    // chunking (including a single chunk) must produce identical output
    // for a per-line-decomposable Map like the wc tokenizer
    val expected = brute(text)
    Seq(0, 1, 3, 7).foreach { nMap =>
      val got = MRJob
        .runWholeSplit(spark, JobSpec(in.toString, "", nMap = nMap),
          WordCount.mapFn, WordCount.reduceFn)
        .collect()
        .map(kv => kv.key -> kv.value.toInt)
        .toMap
      got shouldBe expected
    }
  }

  test("splitChunks is byte-faithful to the reference Split walk, CRLF included") {
    // direct simulation of the reference's Split (mapreduce.go:74-112),
    // written from its observed behavior: scanner-normalize each line
    // (strip \r?\n, append \n), cut when cumulative bytes exceed
    // nchunk*m, advancing one chunk at a time
    def referenceSplit(raw: Array[Byte], nMap: Int): Seq[String] = {
      val nchunk = raw.length.toLong / nMap + 1
      val text = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
      val rawLines = text.split("\n", -1).toSeq
      val lines =
        (if (rawLines.nonEmpty && rawLines.last.isEmpty) rawLines.init else rawLines)
          .map(_.stripSuffix("\r"))
      val chunks = scala.collection.mutable.ArrayBuffer(new StringBuilder)
      var i = 0L
      var m = 1
      lines.foreach { l =>
        val normalized = l + "\n"
        if (i > nchunk * m) { chunks += new StringBuilder; m += 1 }
        chunks.last ++= normalized
        i += normalized.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      }
      chunks.map(_.toString).toSeq
    }

    // CRLF input, unterminated last line, uneven line lengths
    val raw = ((1 to 30).map(i => s"word$i alpha beta\r\n").mkString +
      "last line no newline").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val in = Files.createTempFile("wc-contig", ".txt")
    Files.write(in, raw)

    for (nMap <- Seq(1, 3, 5)) {
      val got = MRJob.splitChunks(spark, JobSpec(in.toString, "", nMap = nMap))
        .collect().sortBy(_._1)
      val expected = referenceSplit(raw, nMap)
      // contiguity + byte fidelity: chunk strings are EXACTLY the
      // reference's split files (CR stripped, every line \n-terminated),
      // and concatenating them in id order reproduces the normalized file
      got.map(_._2).toSeq shouldBe expected
      got.map(_._2).mkString shouldBe expected.mkString
    }

    // and the Map path over contiguous chunks leaves wc output unchanged
    val viaContig = MRJob
      .runWholeSplitContiguous(spark, JobSpec(in.toString, "", nMap = 3),
        WordCount.mapFn, WordCount.reduceFn)
      .collect().map(kv => kv.key -> kv.value.toInt).toMap
    viaContig shouldBe brute(new String(raw, java.nio.charset.StandardCharsets.UTF_8))
  }

  test("nReduce pins shuffle partition count; output unaffected") {
    val in = Files.createTempFile("wc-in4", ".txt")
    Files.writeString(in, "p q p r q p")
    val r1 = WordCount.viaMR(spark, JobSpec(in.toString, "", nReduce = 1))
    val r3 = WordCount.viaMR(spark, JobSpec(in.toString, "", nReduce = 3))
    r1.collect().sortBy(_.key).toSeq shouldBe r3.collect().sortBy(_.key).toSeq
    // the reduce genuinely runs at nReduce partitions, with exactly one
    // shuffle (DoReduce parity: repartition + per-partition sort + run walk)
    r3.rdd.getNumPartitions shouldBe 3
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // shuffles in the final plan section only
    val plan = r3.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    withClue(plan) {
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }
  }
}
