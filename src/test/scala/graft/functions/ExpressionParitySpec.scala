package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Interpreted-eval vs codegen parity for the custom Catalyst expressions.
  * The dataframe path exercises generated code; `expr.eval(row)` exercises
  * the interpreted `nullSafeEval` — the two must agree on arbitrary input
  * or results would depend on whether codegen kicked in (fallback paths,
  * constant folding, speculative plans).
  */
class ExpressionParitySpec extends AnyFunSuite with Matchers {

  private val hsGen: Gen[Seq[Long]] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, (1L << 60) - 1)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(1234L + i)).toSeq)

  test("AffineMinHashes: interpreted equals brute-force formula") {
    val expr = AffineMinHashes(BoundReference(0, ArrayType(LongType), nullable = false), 16)
    for (hs <- samples(hsGen, 40)) {
      val row = InternalRow(new GenericArrayData(hs.toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq
      val want =
        if (hs.isEmpty) Seq.empty[Long]
        else (0 until 16).map(j =>
          hs.map(h => (Sketches.a(j) * (h % Sketches.Prime) + Sketches.b(j)) % Sketches.Prime).min)
      got shouldBe want
    }
  }

  test("SimHashSignature: interpreted equals bit-majority brute force") {
    val expr = SimHashSignature(BoundReference(0, ArrayType(LongType), nullable = false), 16)
    for (hs <- samples(hsGen, 40)) {
      val row = InternalRow(new GenericArrayData(hs.toArray))
      val got = expr.eval(row).asInstanceOf[Long]
      val want = (0 until 16).map { j =>
        val ones = hs.count(h => ((h >> j) & 1L) == 1L)
        if (hs.nonEmpty && 2 * ones >= hs.size) 1L << j else 0L
      }.sum
      got shouldBe want
    }
  }

  test("WordNGrams: interpreted matches sliding-window reference") {
    val tokGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dd", "e")))
    val distinctExpr = WordNGrams(
      BoundReference(0, ArrayType(StringType), nullable = false), 3, distinct = true)
    val allExpr = WordNGrams(
      BoundReference(0, ArrayType(StringType), nullable = false), 3, distinct = false)
    for (toks <- samples(tokGen, 60)) {
      val row = InternalRow(new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any]))
      val want = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      allExpr.eval(row).asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq shouldBe want
      distinctExpr.eval(row).asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq shouldBe want.distinct
    }
  }

  test("MaxFreqCount: matches groupBy-count mode on arbitrary arrays") {
    val tokGen = Gen.choose(0, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y y", "z", "w", "")))
    val expr = MaxFreqCount(BoundReference(0, ArrayType(StringType), nullable = false))
    for (toks <- samples(tokGen, 60)) {
      val row = InternalRow(new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any]))
      val want =
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.size).max.toLong
      expr.eval(row).asInstanceOf[Long] shouldBe want
    }
  }

  test("LangIdExpr: one-pass scorer equals the portable when-chain") {
    val markers = graft.functions.TextFunctions.LangMarkers
    val expr = LangIdExpr(BoundReference(0, StringType, nullable = false), markers)
    val allMarkers = markers.flatMap(_._2)
    val wordGen = Gen.oneOf(allMarkers ++ Seq("xx", "Yy", "z9", "", "ÀÉ", "ß"))
    val docGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val cjkDoc = "some text 漢字 more"
    val docs = samples(docGen, 80) ++ Seq("", "   ", cjkDoc, "ümlaut über")
    // portable reference evaluated through a real DataFrame (codegen path)
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val want = spark.createDataset(docs).toDF("text")
      .select(graft.functions.TextFunctions.langId(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getString(0)).toSeq
    val got = docs.map(d =>
      expr.eval(InternalRow(UTF8String.fromString(d))).asInstanceOf[UTF8String].toString)
    got shouldBe want
  }

  test("Md5Prefix60Array: matches hex-prefix parse of full md5") {
    val expr = Md5Prefix60Array(BoundReference(0, ArrayType(StringType), nullable = false))
    val strs = Seq("", "a", "hello world", "žluťoučký kůň", "the quick brown fox")
    val row = InternalRow(new GenericArrayData(
      strs.map(UTF8String.fromString).toArray[Any]))
    val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq
    val want = strs.map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    got shouldBe want
  }

  test("Md5Prefix60Scalar: matches the conv(substring(md5)) SQL chain it " +
    "replaced (r14)") {
    val expr = Md5Prefix60Scalar(BoundReference(0, StringType, nullable = true))
    val strs = Seq("", "a", "12345#0", "hello world", "žluťoučký kůň",
      "9999999#bmed199", "the quick brown fox")
    for (s <- strs) {
      val got = expr.eval(InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[Long]
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      got shouldBe java.lang.Long.parseLong(hex.take(15), 16)
    }
    // null in -> null out, like the builtin chain
    assert(expr.eval(InternalRow(null)) == null)
  }

  test("FloatVecDotProduct/Cosine: interpreted equals manual loop") {
    val vecGen = Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 10.0f))
    val dot = FloatVecDotProduct(
      BoundReference(0, ArrayType(FloatType), nullable = false),
      BoundReference(1, ArrayType(FloatType), nullable = false))
    val cos = FloatVecCosine(
      BoundReference(0, ArrayType(FloatType), nullable = false),
      BoundReference(1, ArrayType(FloatType), nullable = false))
    for (i <- 0 until 30) {
      val a = vecGen(Gen.Parameters.default, Seed(4321L + i)).get
      val b = vecGen(Gen.Parameters.default, Seed(9999L + i)).get
      val row = InternalRow(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val wantDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }
        .foldLeft(0.0)(_ + _)
      dot.eval(row).asInstanceOf[Double] shouldBe wantDot
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      val wantCos = if (na == 0.0 || nb == 0.0) 0.0 else wantDot / (na * nb)
      cos.eval(row).asInstanceOf[Double] shouldBe wantCos
    }
  }

  test("NearestCentroid: interpreted equals brute-force argmax with ties") {
    val vecGen = Gen.listOfN(6, Gen.choose(-100, 100).map(_ / 10.0f))
    def round6(d: Double): Double =
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    for (i <- 0 until 30) {
      val base = (0 until 4).map(c =>
        vecGen(Gen.Parameters.default, Seed(777L + 31 * i + c)).get
          .map(_.toDouble).toArray)
      // force ties: centroid 4 duplicates centroid 1 (argmax must pick the
      // LOWER id); centroid 5 is all-zero (cos defined as 0.0)
      val cents = (base :+ base(1).clone() :+ Array.fill(6)(0.0)).toArray
      val ids = cents.indices.map(_.toLong + 10L).toArray
      val expr = NearestCentroid(
        BoundReference(0, ArrayType(FloatType), nullable = false), ids, cents)
      val vs = vecGen(Gen.Parameters.default, Seed(555L + i)).get :+
        0.0f // also run a zero query against every centroid set
      Seq(vs.init, List.fill(6)(0.0f)).foreach { v =>
        val row = InternalRow(new GenericArrayData(v.toArray))
        val got = expr.eval(row).asInstanceOf[Long]
        val want = ids.zip(cents).map { case (id, cv) =>
          val dot = v.zip(cv).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
          val nb = math.sqrt(cv.foldLeft(0.0)((s, y) => s + y * y))
          val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
          (-round6(c), id)
        }.min // (negcos, id) lexicographic min = cos max, tie → lower id
        got shouldBe want._2
      }
    }
  }

  private val toksGen: Gen[Seq[String]] =
    Gen.choose(0, 47).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'z').flatMap(c =>
        Gen.choose(1, 6).map(l => c.toString * l))))

  test("TokenChunks: equals grouped(k) with the partial tail kept") {
    for (k <- Seq(1, 3, 10); ts <- samples(toksGen, 25)) {
      val expr = TokenChunks(
        BoundReference(0, ArrayType(StringType), nullable = false), k, k)
      val row = InternalRow(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      got shouldBe ts.grouped(k).map(_.mkString(" ")).toSeq
    }
  }

  test("TokenChunks strided: sliding(k, stride) with partial tails kept") {
    for (k <- Seq(3, 10); stride <- Seq(1, 2, k); ts <- samples(toksGen, 25)) {
      val expr = TokenChunks(
        BoundReference(0, ArrayType(StringType), nullable = false), k, stride)
      val row = InternalRow(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      val expected = (0 until ts.length by stride)
        .map(from => ts.slice(from, from + k).mkString(" "))
      got shouldBe expected
    }
  }

  test("UnigramStats: counts and entropy sum match a brute-force recompute") {
    val expr = UnigramStats(
      BoundReference(0, ArrayType(StringType), nullable = false))
    for (ts <- samples(toksGen, 25)) {
      val row = InternalRow(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData].toDoubleArray()
      val counts = ts.groupBy(identity).view.mapValues(_.size.toLong)
      got(0) shouldBe ts.size.toDouble
      got(1) shouldBe counts.size.toDouble
      // float-sum order may differ from the map's iteration order — bound
      // far below the 9-decimal consumer rounding
      got(2) shouldBe counts.values
        .map(c => c * math.log(c.toDouble)).sum +- 1e-9
    }
  }

  test("NGramCoverage: all seven slots match a brute-force recompute") {
    for (n <- Seq(2, 5); ts <- samples(toksGen, 40)) {
      val expr = NGramCoverage(
        BoundReference(0, ArrayType(StringType), nullable = false), n)
      val row = InternalRow(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq
      val totalChars = ts.map(_.length.toLong).sum
      if (ts.size < n) got shouldBe Seq(0L, 0L, 0L, 0L, 0L, 0L, totalChars)
      else {
        val grams = (0 to ts.size - n).map(i => ts.slice(i, i + n).mkString(" "))
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val topCount = counts.values.max
        val topGram = counts.collect { case (g, c) if c == topCount => g }.min
        val covered = grams.indices
          .filter(i => counts(grams(i)) >= 2)
          .flatMap(i => i until i + n).toSet
        got shouldBe Seq(
          grams.size.toLong,
          topCount,
          topGram.count(_ != ' ').toLong,
          counts.count(_._2 >= 2).toLong,
          covered.size.toLong,
          covered.toSeq.map(p => ts(p).length.toLong).sum,
          totalChars)
      }
    }
  }

  test("NGramCoverage: a doubled token array is fully dup-covered") {
    val expr = NGramCoverage(
      BoundReference(0, ArrayType(StringType), nullable = false), 5)
    for (ts <- samples(toksGen, 25) if ts.size >= 5) {
      val dd = ts ++ ts
      val row = InternalRow(new GenericArrayData(
        dd.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray
      got(4) shouldBe dd.size.toLong // covered_words = every position
      got(5) shouldBe got(6) // covered_chars = total_chars
    }
  }

  test("SelfSpans: runs match a brute-force pair/diagonal/island recompute") {
    val n = 3
    val minRun = 4
    val maxOcc = 4
    val expr = SelfSpans(
      BoundReference(0, ArrayType(StringType), nullable = false), n, minRun, maxOcc)
    // small alphabet → plenty of natural repeats
    val gen = Gen.choose(0, 30).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "b", "c")))
    for (ts <- samples(gen, 60)) {
      val row = InternalRow(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray.toSeq
      val grams = if (ts.size < n) Seq.empty
        else (0 to ts.size - n).map(i => ts.slice(i, i + n).mkString(" "))
      val byGram = grams.indices.groupBy(grams(_))
        .filter { case (_, ps) => ps.size >= 2 && ps.size <= maxOcc }
      val pairs = byGram.values.flatMap(ps =>
        for (a <- ps.indices; b <- a + 1 until ps.size) yield (ps(b) - ps(a), ps(a)))
      val runs = pairs.groupBy(_._1).values.flatMap { ds =>
        // islands: consecutive pos_a on one diagonal
        val sorted = ds.map(_._2).toSeq.sorted
        sorted.zipWithIndex.groupBy { case (p, r) => p - r }.values
          .map(_.size.toLong + n - 1)
      }.filter(_ >= minRun).toSeq
      val want =
        if (runs.isEmpty) Seq(0L, 0L, 0L)
        else Seq(runs.size.toLong, runs.max, runs.sum)
      got shouldBe want
    }
  }

  test("SelfSpans: a doubled array's longest span is the full original") {
    val expr = SelfSpans(
      BoundReference(0, ArrayType(StringType), nullable = false), 3, 5, 8)
    // distinct tokens → the only repetition is the planted doubling
    val ts = (0 until 12).map(i => ('a' + i).toChar.toString * 2)
    val row = InternalRow(new GenericArrayData(
      (ts ++ ts).map(UTF8String.fromString).toArray))
    val got = expr.eval(row).asInstanceOf[ArrayData].toLongArray
    got(0) shouldBe 1L // one run, on the offset-12 diagonal
    got(1) shouldBe 12L // spanning the whole original
    got(2) shouldBe 12L
  }

  test("ElementsAt: gathers in index order, skips out-of-range") {
    val expr = ElementsAt(
      BoundReference(0, ArrayType(StringType), nullable = false),
      BoundReference(1, ArrayType(LongType), nullable = false))
    for (ts <- samples(toksGen, 25)) {
      val idxs = Seq(0L, 2L, ts.length - 1L, ts.length.toLong, -1L, 1L)
      val row = InternalRow(
        new GenericArrayData(ts.map(UTF8String.fromString).toArray),
        new GenericArrayData(idxs.toArray))
      val got = expr.eval(row).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
      val want = idxs.filter(i => i >= 0 && i < ts.length).map(i => ts(i.toInt))
      got shouldBe want
    }
  }
}
