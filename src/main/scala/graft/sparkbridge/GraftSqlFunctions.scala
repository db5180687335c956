package graft.sparkbridge

import graft.expressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SQL registration for the graft kernel expressions, so `spark.sql` users
 * get the same codegen'd primitives as the Column API (FastText):
 *
 * {{{
 *   SELECT graft_jaccard(graft_shingles(a.text, 4), graft_shingles(b.text, 4))
 * }}}
 *
 * Two entry points:
 *  - `GraftExtensions` for `spark.sql.extensions` config (production: every
 *    session in the cluster gets the functions at build time);
 *  - `GraftSqlFunctions.register(spark)` for an already-running session
 *    (notebooks, tests).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftSqlFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private[sparkbridge] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_shingles",
      new ExpressionInfo(classOf[SortedShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => SortedShingles(args.head, intArg(args(1), "graft_shingles"))),
    ("graft_hashed_shingles",
      new ExpressionInfo(classOf[HashedShingles].getName, "graft_hashed_shingles"),
      (args: Seq[Expression]) => HashedShingles(args.head, intArg(args(1), "graft_hashed_shingles"))),
    ("graft_xhash32_array",
      new ExpressionInfo(classOf[XHash32Array].getName, "graft_xhash32_array"),
      (args: Seq[Expression]) => XHash32Array(args.head)),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1), "graft_minhash_sig"))),
    ("graft_band_keys",
      new ExpressionInfo(classOf[BandKeys].getName, "graft_band_keys"),
      (args: Seq[Expression]) =>
        BandKeys(args.head, intArg(args(1), "graft_band_keys"), intArg(args(2), "graft_band_keys"))),
    ("graft_simhash32",
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    ("graft_jaccard",
      new ExpressionInfo(classOf[JaccardSorted].getName, "graft_jaccard"),
      (args: Seq[Expression]) => JaccardSorted(args.head, args(1))),
    ("graft_jaccard_hashed",
      new ExpressionInfo(classOf[JaccardSortedLong].getName, "graft_jaccard_hashed"),
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotSeq].getName, "graft_dot"),
      (args: Seq[Expression]) => DotSeq(args.head, args(1))),
    ("graft_sorted_contains",
      new ExpressionInfo(classOf[SortedLongContains].getName, "graft_sorted_contains"),
      (args: Seq[Expression]) => SortedLongContains(args.head, args(1))),
    ("graft_coverage",
      new ExpressionInfo(classOf[CoverageCounts].getName, "graft_coverage"),
      (args: Seq[Expression]) =>
        CoverageCounts(args.head, intArg(args(1), "graft_coverage"),
          stringSeqArg(args(2), "graft_coverage"))),
    ("graft_token_entropy",
      new ExpressionInfo(classOf[TokenEntropyBits].getName, "graft_token_entropy"),
      (args: Seq[Expression]) => TokenEntropyBits(args.head))
  )

  /** A foldable array-of-strings argument (the reference vocabulary rides
    * the plan as a literal — metadata-scale by contract). */
  private def stringSeqArg(e: Expression, fn: String): Seq[String] = e match {
    case other if other.foldable =>
      other.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          val elems = a.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType)
          if (elems.exists(_ == null)) throw new IllegalArgumentException(
            s"$fn reference array must not contain NULL elements")
          elems.map(_.toString).toSeq
        case v => throw new IllegalArgumentException(
          s"$fn expects a literal array<string> argument, got $v")
      }
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal array<string> argument, got $other")
  }

  /** Register into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftFunctionRegistryBridge.register(spark, name, info, builder)
    }
}
