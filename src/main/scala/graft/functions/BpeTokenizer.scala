package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy subword tokenizer (round-8): the token COUNT a
  * trained BPE vocabulary would produce, computed as greedy
  * longest-match segmentation against a FIXED vocabulary — the
  * standard WordPiece/BPE inference rule (merge tables reduce to a
  * longest-match vocabulary at inference; Song et al. 2021 "Fast
  * WordPiece Tokenization" is exactly this linear trie walk).
  *
  * Why it exists: the text family's whitespace counts misestimate BPE
  * lengths 1.3–2×, so token budgets (chunking, sequence packing)
  * computed from them over/under-fill model contexts. This expression
  * makes a vocab-true count available wherever a token count is
  * consumed — [[graft.operators.Pack.sequences]] takes the count as a
  * caller-supplied column (plug this in), and
  * [[graft.operators.TextOps.stats]] exposes it behind an optional
  * vocabulary parameter. Defaults everywhere stay whitespace.
  *
  * Semantics of `bpe_count(text, vocab)`: words are maximal runs of
  * non-space characters; each word is segmented left-to-right, at each
  * position consuming the LONGEST vocabulary entry that matches (ties
  * impossible — entries are exact strings), or exactly one character
  * (the unknown/byte-fallback token) when nothing matches; the result
  * is the total token count. Greedy longest-match is deterministic on
  * any engine — the DuckDB oracle replays it with a recursive CTE.
  *
  * Scale: a native expression with `doGenCode` — the vocabulary folds
  * into an immutable trie ONCE per plan (foldable-checked at analysis,
  * attached as a codegen reference object), and each row is a single
  * linear trie walk inside whole-stage codegen. No UDF serialization,
  * no per-row vocabulary parsing.
  */
object BpeTok {

  /** Immutable char trie; 128-wide direct-index fanout for ASCII (the
    * hot path — vocab entries are overwhelmingly ASCII), map fallback
    * beyond. */
  final class Trie extends Serializable {
    val ascii = new Array[Trie](128)
    var other: java.util.HashMap[Character, Trie] = _
    var terminal = false
    /** 1-based vocabulary position of the entry ending here (0 while
      * non-terminal; first occurrence wins for duplicate entries). */
    var id = 0L

    def child(c: Char): Trie =
      if (c < 128) ascii(c)
      else if (other == null) null
      else other.get(Character.valueOf(c))

    def ensureChild(c: Char): Trie = {
      val existing = child(c)
      if (existing != null) existing
      else {
        val t = new Trie
        if (c < 128) ascii(c) = t
        else {
          if (other == null) other = new java.util.HashMap[Character, Trie]()
          other.put(Character.valueOf(c), t)
        }
        t
      }
    }
  }

  def build(vocab: Iterable[String]): Trie =
    buildIndexed(vocab.iterator.zipWithIndex.map {
      case (v, i) => (v, i + 1L)
    })

  /** Build with explicit 1-based ids — callers that filter null/empty
    * vocabulary slots pass the ORIGINAL array position so ids stay
    * aligned with the oracle's element order. */
  def buildIndexed(vocab: Iterator[(String, Long)]): Trie = {
    val root = new Trie
    vocab.foreach { case (v, vid) =>
      var node = root
      var i = 0
      while (i < v.length) { node = node.ensureChild(v.charAt(i)); i += 1 }
      if (!node.terminal) { node.terminal = true; node.id = vid }
    }
    root
  }

  /** Total greedy-longest-match token count over whitespace-separated
    * words. Spaces separate, never tokenize; an unmatched character is
    * one fallback token. */
  def countTokens(text: UTF8String, root: Trie): Long = {
    val s = text.toString
    val len = s.length
    var i = 0
    var n = 0L
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else {
        var node = root
        var j = i
        var best = -1
        var walking = true
        while (walking && j < len) {
          val ch = s.charAt(j)
          if (ch == ' ') walking = false
          else {
            val next = node.child(ch)
            if (next == null) walking = false
            else {
              node = next
              j += 1
              if (node.terminal) best = j
            }
          }
        }
        // fallback advances one CODEPOINT, not one UTF-16 unit: a
        // supplementary-plane char (emoji) is ONE unknown token, matching
        // the oracle's codepoint-based substr/len (round-9 ADVICE fix)
        i = if (best > i) best else i + Character.charCount(s.codePointAt(i))
        n += 1L
      }
    }
    n
  }

  /** Greedy longest-match token IDS over whitespace-separated words —
    * the same walk as [[countTokens]], emitting the id of each consumed
    * vocabulary entry (1-based position in the vocabulary array) and 0
    * for each single-codepoint unknown fallback. The id assignment is
    * part of the contract: callers and the DuckDB oracle both read ids
    * off the vocabulary's element order. */
  def tokenIds(text: UTF8String, root: Trie): Array[Long] = {
    val s = text.toString
    val len = s.length
    var i = 0
    val out = new scala.collection.mutable.ArrayBuffer[Long](len / 4 + 4)
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else {
        var node = root
        var j = i
        var best = -1
        var bestId = 0L
        var walking = true
        while (walking && j < len) {
          val ch = s.charAt(j)
          if (ch == ' ') walking = false
          else {
            val next = node.child(ch)
            if (next == null) walking = false
            else {
              node = next
              j += 1
              if (node.terminal) { best = j; bestId = node.id }
            }
          }
        }
        if (best > i) { out += bestId; i = best }
        else { out += 0L; i += Character.charCount(s.codePointAt(i)) }
      }
    }
    out.toArray
  }

  /** ArrayData wrapper for codegen call sites. */
  def tokenIdsArray(text: UTF8String, root: Trie): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tokenIds(text, root))

  /** Trie of a literal vocabulary ArrayData; null/empty slots are
    * skipped but ids keep the ORIGINAL 1-based array position. */
  def trieFrom(arr: ArrayData): Trie =
    buildIndexed((0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => (arr.getUTF8String(i).toString, i + 1L))
      .filter(_._1.nonEmpty))
}

/** Shared analysis contract of the bpe_* expressions: string text +
  * foldable non-null array<string> vocabulary, folded once per plan
  * into a [[BpeTok.Trie]]. */
trait BpeVocabExpression extends BinaryExpression {
  def prettyName: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string text argument, got ${left.dataType}")
    else right.dataType match {
      case ArrayType(StringType, _) if right.foldable =>
        if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a non-null vocabulary")
        else TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        // per-row vocabularies would rebuild the trie per row — reject
        // at analysis like Spark's own parameter expressions
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) vocabulary")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> vocabulary, got $other")
    }

  @transient protected lazy val trie: BpeTok.Trie =
    BpeTok.trieFrom(right.eval().asInstanceOf[ArrayData])
}

/** bpe_count(string, array<string>) → bigint; the vocabulary must be a
  * foldable literal (it becomes the per-plan trie). */
case class BpeCount(left: Expression, right: Expression)
    extends BpeVocabExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(text: Any, vocab: Any): Any =
    BpeTok.countTokens(text.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie,
      classOf[BpeTok.Trie].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeTok.countTokens($t, $trieRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCount =
    copy(left = newLeft, right = newRight)
}

/** bpe_tokens(string, array<string>) → array<bigint>: the greedy
  * longest-match segmentation itself — each element is the 1-based
  * vocabulary position of the consumed entry, 0 for a single-codepoint
  * unknown fallback. `size(bpe_tokens(t, v)) == bpe_count(t, v)` by
  * construction (same walk). This is the id stream a packed training
  * shard consumes; [[graft.operators.Pack]] concatenates it per shard. */
case class BpeTokens(left: Expression, right: Expression)
    extends BpeVocabExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override protected def nullSafeEval(text: Any, vocab: Any): Any =
    BpeTok.tokenIdsArray(text.asInstanceOf[UTF8String], trie)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("bpeTrie", trie,
      classOf[BpeTok.Trie].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeTok.tokenIdsArray($t, $trieRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokens =
    copy(left = newLeft, right = newRight)
}
