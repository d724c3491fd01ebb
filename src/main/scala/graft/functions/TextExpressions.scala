package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * The built-in route (regexp split → `transform`/`slice`/`concat_ws` →
  * `array_distinct`) evaluates interpreted lambdas and allocates several
  * intermediate arrays per row; profiled at ~30 µs/row it dominates the
  * MinHash pipeline. These single-pass versions are ~one allocation per
  * shingle and stay inside whole-stage codegen via static helper calls.
  */
object TextOps {

  /** Distinct word n-gram shingles of a whitespace-tokenized string,
    * first-occurrence order, single pass.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  /** ALL word n-gram shingles in document order, duplicates KEPT — the
    * variant repetition scoring needs ([[shingles]] dedups, which erases
    * exactly the signal a repetition ratio measures).
    */
  def shinglesAll(text: UTF8String, n: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over a shingle array: element k is
    * `min over shingles of XXH64(shingleBytes, seed = k)`. Empty input →
    * Long.MaxValue sentinel per slot.
    */
  def minhashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = shingles.numElements()
    var i = 0
    while (i < m) {
      val s = shingles.getUTF8String(i)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), k.toLong)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(Long.box(_): Any))
  }

  /** 64-bit SimHash over a token array: per bit, +1/-1 tally across token
    * XXH64 hashes (seed 42 = Spark's `xxhash64` default), sign → bit.
    */
  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  // One digest per thread: MessageDigest.getInstance does a provider
  // lookup per call, which dominates when hashing millions of short
  // shingles (DigestUtils.md5Hex pays it every time).
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) & 0xff) >> 4)
      out(2 * i + 1) = HexDigits(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** unsigned lexicographic byte compare — same order as comparing the
    * hex encodings as strings
    */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** md5-based MinHash signature: element k is the lexicographic min over
    * shingles of `md5(shingle || ':' || k)` (hex) — identical to the SQL
    * `array_min(transform(shs, s -> md5(concat(s, ':k'))))` but one pass,
    * no interpreted lambdas, raw-digest comparisons, and hex encoding
    * only of the winning slots. Empty input → empty strings.
    */
  def minhashMd5Signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Array[Byte]](numHashes)
    val seedTails = new Array[Array[Byte]](numHashes)
    var k = 0
    while (k < numHashes) { seedTails(k) = (":" + k).getBytes("UTF-8"); k += 1 }
    val md = md5Local.get()
    val m = shingles.numElements()
    var i = 0
    while (i < m) {
      val s = shingles.getUTF8String(i).getBytes
      k = 0
      while (k < numHashes) {
        md.reset()
        md.update(s)
        md.update(seedTails(k))
        val h = md.digest()
        if (sig(k) == null || unsignedLess(h, sig(k))) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(h =>
      UTF8String.fromString(if (h == null) "" else toHex(h)): Any))
  }

  /** md5-based 60-bit SimHash over a token array: each token's hash is the
    * first 15 hex chars of its md5 (60 bits, fits a signed long on every
    * engine); per bit, ±1 tally, sign → bit. Row-wise — replaces an
    * explode + 60-column aggregation (and its shuffle) with one pass.
    */
  def simhashMd5_60(toks: ArrayData): Long = {
    val counts = new Array[Int](60)
    val md = md5Local.get()
    val m = toks.numElements()
    var i = 0
    while (i < m) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      // first 15 hex chars = high 60 bits of the first 8 digest bytes
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h = h >>> 4 // drop the 16th hex char's low nibble
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Whitespace tokens as ArrayData — the codegen-callable face of
    * [[tokenize]] (one pass, no regex, empties dropped).
    */
  def tokensArray(text: UTF8String): ArrayData = {
    val toks = tokenize(text.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any))
  }

  /** Adjacent character pairs of one token, duplicates kept — the BPE
    * merge-candidate generator ([[graft.operators.Curation.bpeMergePairs]]).
    * Single pass, one 2-char string per pair; empty for 0/1-char tokens
    * (the `sequence(1, len-1)` SQL route counts DOWN for those and
    * fabricates phantom pairs unless guarded).
    */
  def charPairs(tok: UTF8String): ArrayData = {
    val s = tok.toString
    if (s.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](s.length - 1)
    var i = 0
    while (i < s.length - 1) {
      out(i) = UTF8String.fromString(s.substring(i, i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** CCNet-style text normalization, the standard pre-dedup transform
    * (lowercase, strip diacritics, fold digits to 0, collapse
    * whitespace): a case/accent/digit variant of a document normalizes
    * to the same string, so normalization-aware exact dedup catches
    * what byte-exact dedup misses. One pass over the decomposed form:
    * NFD, drop combining marks, lowercase, [0-9] → '0', whitespace runs
    * → one space, trim.
    *
    * Cross-engine contract (the q109 oracle): equals DuckDB's
    * `strip_accents` + `lower` + regexp folds for ASCII and Latin-1
    * accented text. Outside that range (Turkish dotted I, full-width
    * digits) the JVM and ICU case/decomposition tables may diverge —
    * the corpus contract is Latin text; TextSpec pins the JVM behavior.
    */
  def normalizeCc(text: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK) {
        if (Character.isWhitespace(c)) { pendingSpace = started }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          started = true
          if (c >= '0' && c <= '9') sb.append('0')
          else sb.append(Character.toLowerCase(c))
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** |A ∩ B| of two SORTED string arrays by a single merge walk —
    * O(|A|+|B|), zero allocation. The fixed-width Jaccard rescore's
    * kernel: candidate pairs carry each side's sorted distinct shingle
    * array and intersect row-locally, so the rescore join emits one row
    * per PAIR instead of one row per (pair, shingle) — the working set
    * that OOM'd the exploded rescore at 100× disappears. Inputs must be
    * sorted by UTF8String binary order (Spark's `sort_array`) and
    * duplicate-free (both hold for `sort_array(word_shingles(...))`).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  private def tokenize(s: String): Array[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }
}

/** Whitespace tokens (runs collapsed, empties dropped), ARRAY<STRING> —
  * single-pass scan, no regex, whole-stage-codegen'd. Replaces the
  * interpreted `filter(split(trim(regexp_replace(...))))` composition on
  * the dozen corpus queries that tokenize every document.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextOps.tokensArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.tokensArray($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Adjacent character pairs of a token (BPE candidates), ARRAY<STRING>. */
case class CharPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextOps.charPairs(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.charPairs($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles, ARRAY<STRING>. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextOps.shingles(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.shingles($t, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All word n-gram shingles, duplicates kept (repetition scoring). */
case class ShinglesAllExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextOps.shinglesAll(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.shinglesAll($t, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature of a shingle array, ARRAY<BIGINT> of length `numHashes`. */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(shs: Any): Any =
    TextOps.minhashSignature(shs.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.minhashSignature($s, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a token array, BIGINT. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(toks: Any): Any =
    TextOps.simhash64(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.simhash64($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** md5-based MinHash signature of a shingle array, ARRAY<STRING> (hex). */
case class MinHashMd5SigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(shs: Any): Any =
    TextOps.minhashMd5Signature(shs.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.minhashMd5Signature($s, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** md5-based 60-bit SimHash of a token array, BIGINT. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(toks: Any): Any =
    TextOps.simhashMd5_60(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextOps.simhashMd5_60($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** CCNet-style normalized text (see [[TextOps.normalizeCc]]). */
case class NormalizeCcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    TextOps.normalizeCc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.normalizeCc($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A ∩ B| of two sorted ARRAY<STRING> columns, BIGINT (see
  * [[TextOps.sortedIntersectCount]]).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextOps.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextExpressions {
  def word_tokens(text: Column): Column =
    ColumnBridge.column(TokensExpr(ColumnBridge.expression(text)))
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))
  def word_shingles_all(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesAllExpr(ColumnBridge.expression(text), n))
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))
  def minhash_md5_signature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashMd5SigExpr(ColumnBridge.expression(shingles), numHashes))
  def simhash_md5_60(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(tokens)))
  def char_pairs(tok: Column): Column =
    ColumnBridge.column(CharPairsExpr(ColumnBridge.expression(tok)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def normalize_cc(text: Column): Column =
    ColumnBridge.column(NormalizeCcExpr(ColumnBridge.expression(text)))
}
