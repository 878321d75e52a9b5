package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for embedding math.
  *
  * Why custom expressions rather than composed built-ins: a 64-dim dot
  * product composed from `element_at`/`+`/`*` is a 129-node expression
  * tree — analysis, null-tracking and codegen all scale with tree size,
  * and join conditions replicate the whole tree (observed multi-second
  * driver overhead per query). These expressions are O(1) nodes with a
  * tight O(dim) loop in both interpreted and generated code.
  *
  * Float determinism contract (shared with the DuckDB oracles): elements
  * are widened float→double individually and accumulated sequentially in
  * ascending index order — bit-identical to the left-associative chains
  * the oracle SQL spells out.
  */
object VectorExpressions {

  /** Sequential-order dot product of two array<float> columns. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[ArrayType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Sequential-order L2 norm of an array<float> column. */
  case class L2Norm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val e = x.getFloat(i).toDouble
        s += e * e
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val e = ctx.freshName("e")
        s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $e = (double) $a.getFloat($i);
          $s += $e * $e;
        }
        ${ev.value} = java.lang.Math.sqrt($s);
        """
      })

    override protected def withNewChildInternal(c: Expression): L2Norm =
      copy(child = c)
  }

  /** Random-hyperplane sign bucket: one '1'/'0' char per plane. Weights
    * are the fixed integer formula w(p,i)=((i*31+p*17) mod 7)-3 over the
    * 1-based index, zero weights skipped (exactly as the oracle SQL).
    * `planeOffset` shifts the plane index — table t of a multi-table
    * LSH uses offset t*planes, giving every table an independent
    * deterministic plane set from the same formula. */
  case class LshBucket(child: Expression, planes: Int,
      planeOffset: Int = 0)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = StringType
    override def prettyName: String = "vec_lsh_bucket"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      val bits = new Array[Char](planes)
      var p = 0
      while (p < planes) {
        var s = 0.0
        var i = 0
        while (i < n) {
          val w = ((i + 1) * 31 + (p + planeOffset) * 17) % 7 - 3
          if (w != 0) s += x.getFloat(i).toDouble * w.toDouble
          i += 1
        }
        bits(p) = if (s > 0) '1' else '0'
        p += 1
      }
      UTF8String.fromString(new String(bits))
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val p = ctx.freshName("p")
        val w = ctx.freshName("w")
        val bits = ctx.freshName("bits")
        s"""
        int $n = $a.numElements();
        char[] $bits = new char[$planes];
        for (int $p = 0; $p < $planes; $p++) {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            int $w = (($i + 1) * 31 + ($p + $planeOffset) * 17) % 7 - 3;
            if ($w != 0) $s += ((double) $a.getFloat($i)) * ((double) $w);
          }
          $bits[$p] = ($s > 0) ? '1' : '0';
        }
        ${ev.value} = UTF8String.fromString(new String($bits));
        """
      })

    override protected def withNewChildInternal(c: Expression): LshBucket =
      copy(child = c)
  }

  /** 64-bit polynomial rolling hash over a string's UTF-8 bytes
    * (h = h*31 + byte, wrapping): the production-speed document
    * fingerprint — one multiply-add per byte inside codegen, no
    * allocation, vs md5's digest machinery. Not SQL-reproducible in
    * DuckDB (no loop), so queries using it are rows-only checked; the
    * Scala reference implementation pins semantics in tests. */
  case class RollingHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "text_rolling_hash"

    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String]
      val n = s.numBytes()
      var h = 0L
      var i = 0
      while (i < n) { h = h * 31L + (s.getByte(i) & 0xff); i += 1 }
      h
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val h = ctx.freshName("h")
        s"""
        int $n = $a.numBytes();
        long $h = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $h = $h * 31L + (($a.getByte($i)) & 0xff);
        }
        ${ev.value} = $h;
        """
      })

    override protected def withNewChildInternal(c: Expression): RollingHash =
      copy(child = c)
  }

  /** Seeded 64-bit string hash for MinHash permutations: the poly-31
    * rolling hash over the bytes of "&lt;seed&gt;|" ++ string, finished with
    * the murmur3 fmix64 avalanche so minima behave like a random
    * permutation (raw poly-31 of short strings never wraps 2^64 and its
    * minima correlate with string length — useless for MinHash).
    *
    * Replaces md5-as-permutation at production speed: one multiply-add
    * per byte plus five mixing ops, all inside whole-stage codegen, a
    * LONG instead of a 32-char hex string through the shuffle. Java
    * Long arithmetic (wrapping *, logical >>>, ^) is exactly u64
    * arithmetic mod 2^64, which the DuckDB oracles replay with HUGEINT
    * modular arithmetic (list_reduce + xor/shift ladder).
    */
  case class SeededMixHash(seed: Int, child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "seeded_mix_hash"

    private val prefixHash: Long = {
      var h = 0L
      s"$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => h = h * 31L + (b & 0xff))
      h
    }

    override def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String]
      val n = s.numBytes()
      var h = prefixHash
      var i = 0
      while (i < n) { h = h * 31L + (s.getByte(i) & 0xff); i += 1 }
      SeededMixHash.fmix64(h)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val h = ctx.freshName("h")
        s"""
        int $n = $a.numBytes();
        long $h = ${prefixHash}L;
        for (int $i = 0; $i < $n; $i++) {
          $h = $h * 31L + (($a.getByte($i)) & 0xff);
        }
        $h ^= $h >>> 33;
        $h *= 0xff51afd7ed558ccdL;
        $h ^= $h >>> 33;
        $h *= 0xc4ceb9fe1a85ec53L;
        $h ^= $h >>> 33;
        ${ev.value} = $h;
        """
      })

    override protected def withNewChildInternal(c: Expression): SeededMixHash =
      copy(child = c)
  }

  object SeededMixHash {
    def fmix64(v: Long): Long = {
      var h = v
      h ^= h >>> 33
      h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33
      h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      h
    }

    /** Unsigned decimal rendering of the seed-prefix poly hash — the
      * HUGEINT accumulator initializer in the DuckDB oracle replay. */
    def prefixHashUnsigned(seed: Int): java.math.BigInteger = {
      var h = 0L
      s"$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => h = h * 31L + (b & 0xff))
      new java.math.BigInteger(java.lang.Long.toUnsignedString(h))
    }
  }

  // ---- Column-level API ------------------------------------------------
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  def vec_lsh_bucket(a: Column, planes: Int): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(a), planes))

  def vec_lsh_bucket_offset(a: Column, planes: Int, offset: Int): Column =
    ColumnBridge.column(
      LshBucket(ColumnBridge.expression(a), planes, offset))

  def text_rolling_hash(a: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(a)))

  def seeded_mix_hash(seed: Int, a: Column): Column =
    ColumnBridge.column(SeededMixHash(seed, ColumnBridge.expression(a)))

  /** Driver-side reference implementation (spec parity). */
  def rollingHashRef(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    bytes.foreach(b => h = h * 31L + (b & 0xff))
    h
  }
}
