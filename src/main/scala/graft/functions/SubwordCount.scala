package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: deterministic subword token count —
  * `subword_count(text, vocab)` returns the number of pieces greedy
  * longest-match segmentation (MaxMatch — the WordPiece inference rule,
  * Wu et al. 2016 "Google's Neural Machine Translation System"; the
  * single-character fallback is the byte-fallback flavor of
  * SentencePiece, Kudo & Richardson 2018) produces over the
  * space-split words of `text` against a corpus-derived vocabulary.
  *
  * Semantics, per word (pieces never cross spaces; empty words — runs
  * of spaces — contribute nothing):
  *  - at each position take the LONGEST vocab piece matching there;
  *  - if none matches, consume one character (the fallback token);
  *  - the count is the number of pieces+fallbacks consumed.
  *
  * This replaces whitespace word counts as the packing currency
  * (q77 → q91): real sequence packing budgets tokenizer output, where
  * frequent words cost 1 and rare words decompose. A full learned BPE
  * merge table is a training artifact; the vocab here is the top-K
  * corpus words ([[graft.ops.TextAnalysis.subwordVocab]]) — same
  * segmentation rule, reproducible in the DuckDB oracle (q90's
  * recursive CTE replays the greedy scan exactly).
  *
  * The vocab argument must be a literal (foldable) array: the piece
  * set + max-piece-length are built ONCE PER EXPRESSION INSTANCE by
  * evaluating the foldable vocab at bind time, and handed to the
  * generated code as a reference object — the per-row path does no
  * memo lookup at all (and cannot degrade if a foldable-but-unfolded
  * vocab reaches execution: binding never depends on per-row object
  * identity). Per row the cost is O(chars · maxPieceLen) hash probes
  * inside whole-stage codegen — no joins, no explode, no per-row set
  * construction.
  *
  * Matching is character-based (String), byte-identical to the
  * oracle's substr on ASCII corpora (the WinnowFps caveat).
  */
case class SubwordCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"subword_count requires STRING text, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"subword_count requires ARRAY<STRING> vocab, got ${right.dataType.catalogString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "subword_count vocab must be a literal array (the piece set is memoized)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "subword_count"

  /** Piece set + max piece length, built once from the foldable vocab
    * (null vocab → empty set; the row result is null anyway via the
    * null-intolerant binary contract).
    */
  @transient private lazy val bound: (java.util.HashSet[String], Integer) =
    SubwordCount.build(right.eval(null).asInstanceOf[ArrayData])

  override protected def nullSafeEval(text: Any, vocab: Any): Any =
    SubwordCount.countWith(text.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subwordVocab", bound, "scala.Tuple2")
    defineCodeGen(ctx, ev,
      (t, _) => s"graft.functions.SubwordCount.countWith($t, (scala.Tuple2) $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordCount =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-bound sibling of [[SubwordCount]]: identical greedy
  * longest-match semantics (one shared `countWith`), but the vocabulary
  * travels as a Spark `Broadcast` handle instead of a plan-literal
  * array. The plan node serializes to a few bytes regardless of
  * |vocab|, so a production 32k–256k-piece vocabulary costs one
  * torrent-broadcast per job instead of bloating every plan, task
  * binary, and UI string that references the expression (the r9–r11
  * "large-vocab" gap).
  *
  * The generated code resolves the broadcast ONCE per partition
  * (partition-init statement), then the per-row path is the same
  * hash-probe scan as the literal form — still inside whole-stage
  * codegen, still zero per-row set construction. The literal form
  * remains the oracle-parity path (its vocab is visible to the SQL
  * oracle); this form is the scale path. Construct via
  * [[SubwordCount.broadcastBound]].
  */
case class SubwordCountBound(
    child: Expression,
    vocab: Broadcast[(java.util.HashSet[String], Integer)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"subword_count_bound requires STRING text, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "subword_count_bound"

  // the broadcast id, not the vocab, is the node's printable identity —
  // plan strings stay O(1) in |vocab|
  override def toString: String = s"subword_count_bound($child, bc=${vocab.id})"

  override protected def nullSafeEval(text: Any): Any =
    SubwordCount.countWith(text.asInstanceOf[UTF8String], vocab.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("subwordVocabBc", vocab,
      classOf[Broadcast[_]].getName)
    val bound = ctx.addMutableState("scala.Tuple2", "subwordBound")
    ctx.addPartitionInitializationStatement(
      s"$bound = (scala.Tuple2) $bc.value();")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.SubwordCount.countWith($t, $bound)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SubwordCountBound = copy(child = newChild)
}

object SubwordCount {

  /** Build the (piece set, max piece length) pair from a vocab array —
    * called once per expression instance at bind time, never per row.
    */
  private[functions] def build(
      vocab: ArrayData): (java.util.HashSet[String], Integer) = {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    if (vocab != null) {
      var i = 0
      val n = vocab.numElements()
      while (i < n) {
        if (!vocab.isNullAt(i)) {
          val p = vocab.getUTF8String(i).toString
          if (p.nonEmpty) {
            set.add(p)
            if (p.length > maxLen) maxLen = p.length
          }
        }
        i += 1
      }
    }
    (set, maxLen)
  }

  /** Greedy longest-match piece count (see class doc) over a pre-built
    * piece set. Shared by the interpreted and generated paths — one
    * source of truth.
    */
  def countWith(text: UTF8String,
                bound: (java.util.HashSet[String], Integer)): Long = {
    val set = bound._1
    val maxLen: Int = bound._2
    val s = text.toString
    val n = s.length
    var tokens = 0L
    var pos = 0
    while (pos < n) {
      if (s.charAt(pos) == ' ') pos += 1
      else {
        var we = pos
        while (we < n && s.charAt(we) != ' ') we += 1
        var p = pos
        while (p < we) {
          var advance = 1
          var l = math.min(maxLen, we - p)
          var found = false
          while (l >= 1 && !found) {
            if (set.contains(s.substring(p, p + l))) {
              advance = l
              found = true
            }
            l -= 1
          }
          p += advance
          tokens += 1
        }
        pos = we
      }
    }
    tokens
  }

  private val info =
    new ExpressionInfo(classOf[SubwordCount].getName, "subword_count")

  /** Arity-checked builder (shared with GraftExtensions; [[Arity]]). */
  private[functions] val builder =
    Arity.checked("subword_count", "2 (text STRING, vocab ARRAY<STRING>)", 2)(
      es => SubwordCount(es(0), es(1)))

  /** Idempotent per-session SQL registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("subword_count")
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column form: the vocab is embedded as one literal array. */
  def apply(spark: SparkSession, text: Column, vocab: Seq[String]): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.call_function("subword_count", text,
      org.apache.spark.sql.functions.typedlit(vocab))
  }

  /** Driver-side twin of [[build]] for an in-memory vocab — one source
    * of truth would be nice, but ArrayData vs Seq forces the split; the
    * two loops are intentionally line-parallel.
    */
  private[functions] def buildFromSeq(
      vocab: Seq[String]): (java.util.HashSet[String], Integer) = {
    val set = new java.util.HashSet[String]()
    var maxLen = 1
    vocab.foreach { p =>
      if (p != null && p.nonEmpty) {
        set.add(p)
        if (p.length > maxLen) maxLen = p.length
      }
    }
    (set, maxLen)
  }

  /** Column form of [[SubwordCountBound]]: builds the piece set ONCE on
    * the driver, broadcasts it, and binds the expression to the handle.
    * Same counts as [[apply]] for the same vocab; plan size independent
    * of |vocab|. Use for vocabularies too large to embed as a literal
    * (the 32k–256k production range).
    */
  def broadcastBound(spark: SparkSession, text: Column,
                     vocab: Seq[String]): Column = {
    val bc = spark.sparkContext.broadcast(buildFromSeq(vocab))
    org.apache.spark.sql.graft.ClassicBridge.column(
      SubwordCountBound(
        org.apache.spark.sql.graft.ClassicBridge.expression(text), bc))
  }
}
