package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-hash kernels as codegen'd expressions: the MinHash
  * signature and SimHash fingerprint computed per document in a single
  * projection, instead of the explode → per-shingle hashing → groupBy
  * formulation (which pays a row explosion of ×shingles plus a shuffle
  * just to aggregate the minima/sums back per document).
  *
  * The aggregation formulations remain in [[graft.ops.Shingles]] — they
  * mirror the DuckDB oracle CTE-for-CTE and serve as the differential
  * twin (TextHashesSpec pins bit-equality of both paths). The
  * expressions exist for the PLAN: signature generation becomes
  * embarrassingly parallel with zero shuffle, which is the shape you
  * want feeding a 100 TB LSH banding stage.
  *
  * Codegen note: like Spark's own regexp/json expressions, doGenCode
  * emits a call to a static runtime helper — the loop-heavy hashing
  * lives in ordinary JVM code, the generated code stays inside the
  * WholeStageCodegen span, and the interpreted `nullSafeEval` twin uses
  * the identical helper so both paths are one implementation.
  */
object TextHashes {
  private val hex = "0123456789abcdef".toCharArray

  // MessageDigest.getInstance walks the JCA provider list and allocates on
  // every call — this is the hottest loop in the dedup ladder (2 digests
  // per shingle in minhash, 1 per token in simhash), so reuse one instance
  // per thread. digest() leaves the instance reset for the next call.
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def md5Hex(s: String): String = {
    val md = md5Local.get()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 8-slice one-permutation MinHash over word 3-gram shingles — the
    * per-document value of [[graft.ops.Shingles.minhashSliced]] over
    * [[graft.ops.Shingles.shingles3All]]: two seeded md5s per shingle,
    * each split into four 8-hex slices, minimum per slice. Null when the
    * document has fewer than 3 tokens (no shingles — mirrors the
    * aggregation path, where such docs produce no signature row). */
  def minhashSliced(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    if (n < 3) return null
    val mins = new Array[String](8)
    var i = 0
    while (i + 2 < n) {
      val s = words.getUTF8String(i).toString + " " +
        words.getUTF8String(i + 1).toString + " " +
        words.getUTF8String(i + 2).toString
      var seed = 0
      while (seed < 2) {
        val h = md5Hex(seed + ":" + s)
        var k = 0
        while (k < 4) {
          val slice = h.substring(8 * k, 8 * k + 8)
          val j = 4 * seed + k
          if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
          k += 1
        }
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  /** 64-bit SimHash over tokens as four 16-bit chunks — the per-document
    * value of [[graft.ops.Shingles.simhashChunks64]]: per token, the
    * md5's first 16 hex digits parse to 64 bits; each bit votes ±1; a
    * chunk packs its 16 bit-signs MSB-first. */
  def simhash64(words: ArrayData): GenericArrayData = {
    val votes = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val h = md5Hex(words.getUTF8String(i).toString)
      var j = 0
      while (j < 4) {
        val v = java.lang.Long.parseLong(h.substring(4 * j, 4 * j + 4), 16)
        var b = 0
        while (b < 16) {
          if (((v >> (15 - b)) & 1L) == 1L) votes(16 * j + b) += 1
          else votes(16 * j + b) -= 1
          b += 1
        }
        j += 1
      }
      i += 1
    }
    val chunks = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var c = 0L
      var b = 0
      while (b < 16) {
        if (votes(16 * j + b) > 0) c |= (1L << (15 - b))
        b += 1
      }
      chunks(j) = c
      j += 1
    }
    new GenericArrayData(chunks)
  }
}

/** words: array&lt;string&gt; → array&lt;string&gt;(8) MinHash signature
  * (null under 3 tokens). */
case class MinHashSlicedExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sliced"

  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashSliced(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.TextHashes.minhashSliced($c);
         |${ev.isNull} = (${ev.value} == null);
         |""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** words: array&lt;string&gt; → array&lt;long&gt;(4) SimHash chunks. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashes.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
