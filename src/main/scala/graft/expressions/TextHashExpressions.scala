package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen'd Catalyst expressions for the dedup-family hot path. Each emits a
 * single static call to a [[TextKernels]] primitive loop, so the work stays
 * inside whole-stage codegen instead of falling back to interpreted
 * higher-order-function evaluation (a boxed closure call per array element —
 * the round-1 bench killer).
 *
 * Column-level reference implementations with identical semantics live in
 * [[graft.functions.TextFunctions]]; FastKernelSpec asserts equality.
 */
private[graft] trait KernelCall { self: Expression =>
  final override def nullable: Boolean = self.children.exists(_.nullable)
}

/** sortedShingles(text, k): distinct char k-grams, sorted. */
case class SortedShingles(child: Expression, k: Int)
    extends UnaryExpression with KernelCall {
  require(k > 0, "shingle length must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.sortedShingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.sortedShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): SortedShingles =
    copy(child = newChild)
}

/** coverageCounts(text, k, ref): [n_distinct_k_grams, n_hits_in_ref] in one
  * pass — the LM-coverage counting kernel. `ref` rides the expression as a
  * literal (metadata-scale by construction: a top-N reference vocabulary),
  * registered as a codegen reference object. */
case class CoverageCounts(child: Expression, k: Int, ref: Seq[String])
    extends UnaryExpression with KernelCall {
  require(k > 0, "gram length must be positive")
  @transient private lazy val refSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](ref.size * 2)
    ref.foreach(r => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(r)))
    s
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.coverageCounts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, refSet)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("covRef", refSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.coverageCounts($c, $k, $refName)")
  }
  override protected def withNewChildInternal(newChild: Expression): CoverageCounts =
    copy(child = newChild)
}

/** intraDocStrip(text, k): [n_spans, n_kept, clean_hash] in one pass. */
case class IntraDocStrip(child: Expression, k: Int)
    extends UnaryExpression with KernelCall {
  require(k > 0, "span length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.intraDocStrip(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.intraDocStrip($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): IntraDocStrip =
    copy(child = newChild)
}

/** xhash32 of each string element, deduplicated, sorted. */
case class XHash32Array(child: Expression)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.xhash32Array(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.xhash32Array($c)")
  override protected def withNewChildInternal(newChild: Expression): XHash32Array =
    copy(child = newChild)
}

/** MinHash signature of a hashed-shingle array. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with KernelCall {
  require(k > 0, "signature length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band keys of a MinHash signature. */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with KernelCall {
  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.bandKeys($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/** 32-bit SimHash of a hashed-shingle array. */
case class SimHash32(child: Expression)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash32(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** hashedShingles(text, k): distinct char k-grams hashed to 64-bit longs
  * (XXH64), sorted — the narrow set representation for dedup pipelines. */
case class HashedShingles(child: Expression, k: Int)
    extends UnaryExpression with KernelCall {
  require(k > 0, "shingle length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.hashedShingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.hashedShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** Binary-search membership of a long value in a sorted long array. */
case class SortedLongContains(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(arr: Any, v: Any): Any =
    TextKernels.sortedLongContains(arr.asInstanceOf[ArrayData], v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, v) => s"graft.expressions.TextKernels.sortedLongContains($a, $v)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedLongContains =
    copy(left = newLeft, right = newRight)
}

/** Jaccard coefficient of two sorted distinct long arrays. */
case class JaccardSortedLong(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.jaccardSortedLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSortedLong =
    copy(left = newLeft, right = newRight)
}

/** [[JaccardSortedLong]] with threshold-aware early exit (see
  * TextKernels.jaccardSortedLongBounded): emits -1.0 for pairs provably
  * below `threshold`, the exact value otherwise. */
case class JaccardSortedLongBounded(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression with KernelCall {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSortedLongBounded(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextKernels.jaccardSortedLongBounded($a, $b, $threshold)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSortedLongBounded =
    copy(left = newLeft, right = newRight)
}

/** skipgramConcat(tokens, window): forward-window skip-gram pairs, each
  * encoded `w1 + NUL + w2` (binary order == (w1, w2) tuple order). */
case class SkipgramConcat(child: Expression, window: Int)
    extends UnaryExpression with KernelCall {
  require(window >= 1, "skip-gram window must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.skipgramConcat(input.asInstanceOf[ArrayData], window)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.skipgramConcat($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): SkipgramConcat =
    copy(child = newChild)
}

/** Containment |A∩B|/|A| of two sorted distinct long arrays with
  * threshold-aware early exit (see TextKernels.containmentSortedLongBounded):
  * -1.0 for pairs provably below `threshold`, the exact value otherwise. */
case class ContainmentSortedLongBounded(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression with KernelCall {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.containmentSortedLongBounded(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextKernels.containmentSortedLongBounded($a, $b, $threshold)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ContainmentSortedLongBounded =
    copy(left = newLeft, right = newRight)
}

/** Sequential left-fold dot product of two numeric arrays (float or double
  * elements), widened to double. Fold order matches the HOF reference form
  * and DuckDB's list_sum — bitwise cross-engine. */
case class DotSeq(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      // Fail at plan time: getDouble over an int array would read garbage.
      s"DotSeq requires array<float> or array<double> input, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextKernels.dotSeq($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotSeq =
    copy(left = newLeft, right = newRight)
}

/** winnowDigest(text, k, w): [n_fp, fp_xor] — one-pass winnowing
  * fingerprint census (monotonic-deque sliding minima over positional
  * k-gram hashes). */
case class WinnowDigest(child: Expression, k: Int, w: Int)
    extends UnaryExpression with KernelCall {
  require(k > 0 && w > 0, "gram and window lengths must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowDigest(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.winnowDigest($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowDigest =
    copy(child = newChild)
}

/** bpeApply(tokens, merges): greedy left-to-right application of a learned
  * BPE merge table. The table rides the expression as a literal
  * (metadata-scale by construction: a top-N pair list from one
  * [[TextKernels.bpeApplyMerges]] training step), registered as a codegen
  * reference object — the tokenizer stage is map-side, broadcast-free,
  * shuffle-free. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with KernelCall {
  @transient private lazy val mergeArr: Array[Array[org.apache.spark.unsafe.types.UTF8String]] =
    merges.map { case (a, b) =>
      Array(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }.toArray
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeApplyMerges(input.asInstanceOf[ArrayData], mergeArr)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.bpeApplyMerges($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

/** bpeEncodeBcast(tokens): vocab-id encode whose vocabulary ships as a
  * Spark BROADCAST instead of a plan literal — the >64k-vocab face. A
  * typedLit map serializes into every task closure of every stage that
  * references it (wire cost grows with the PLAN), while a broadcast ships
  * once per executor and the plan carries only the handle; the
  * UTF8String-keyed lookup table is decoded once per executor
  * ([[TextKernels.BcastVocab]]) and shared across tasks. Value-identical
  * to the literal-map [[graft.functions.TextFunctions.bpeEncodeIds]]
  * (TokenizerPropertySpec pins parity at an 8192-entry vocab). */
case class BpeEncodeBcast(
    child: Expression,
    vocab: org.apache.spark.broadcast.Broadcast[Map[String, Int]],
    unkId: Int) extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeBcast(input.asInstanceOf[ArrayData], vocab, unkId)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocabBc", vocab,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.bpeEncodeBcast($c, $ref, $unkId)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeBcast =
    copy(child = newChild)
}

/** hashedWordGrams(text, n): sorted distinct xhash32 of every word n-gram
  * (see [[TextKernels.hashedWordGrams]]). */
case class HashedWordGrams(child: Expression, n: Int)
    extends UnaryExpression with KernelCall {
  require(n > 0, "n-gram size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.hashedWordGrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.hashedWordGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): HashedWordGrams =
    copy(child = newChild)
}

/** tokenEntropyBits(text): [n_tokens, bits] in one pass — whole-bit
  * empirical token entropy (see [[TextKernels.tokenEntropyBits]]). */
case class TokenEntropyBits(child: Expression)
    extends UnaryExpression with KernelCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenEntropyBits(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.tokenEntropyBits($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenEntropyBits =
    copy(child = newChild)
}

/** Jaccard coefficient of two sorted distinct string arrays. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TextKernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
