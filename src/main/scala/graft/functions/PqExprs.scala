package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Fused Σ (aᵢ-bᵢ)² over two `array<float>` columns — the product-
  * quantization assignment kernel (nearest sub-codeword by squared L2).
  * Same single-primitive-loop rationale as [[CosineSimilarity]]; double
  * accumulation in sequential order for cross-engine parity. NULL on
  * null inputs or length mismatch. */
case class SqDistF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_f"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF =
    copy(left = newLeft, right = newRight)
}

object SqDistF {
  val fnName = "sq_dist_f"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => SqDistF(exprs(0), exprs(1)), "scala_udf")

  def apply(a: Column, b: Column): Column = call_function(fnName, a, b)
}

/** Asymmetric-distance-computation score for product-quantized vectors:
  * given a vector's PQ `codes` (array<tinyint>, one sub-codeword id per
  * subspace) and a per-QUERY lookup `table` (array<double>, flattened
  * `m × ksub`, entry `j·ksub + c` = dot(query subvector j, codeword c of
  * subspace j)), the approximate dot product is Σⱼ table[j·ksub +
  * codes[j]] — m array reads and m adds per corpus row, never touching
  * the original vector. That is the PQ bargain at 100 TB: the coarse
  * scan reads m bytes per vector instead of dim×4. Summation is
  * sequential over j (parity with a j-ordered list_sum). NULL on null
  * inputs or a table too small for the codes. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<tinyint>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val table = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val t = table.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      val idx = j * ksub + codes.getByte(j).toInt
      if (idx < 0 || idx >= t) return null
      s += table.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |final int $m = $codes.numElements();
         |final int $t = $table.numElements();
         |double $s = 0.0;
         |for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |  final int $idx = $j * $ksub + (int) $codes.getByte($j);
         |  if ($idx < 0 || $idx >= $t) { ${ev.isNull} = true; }
         |  else { $s += $table.getDouble($idx); }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** Column API via the expression bridge (ksub is a plan-time constant,
    * not a runtime column, so no registry indirection). */
  def apply(codes: Column, table: Column, ksub: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      PqAdcScore(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(codes),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(table), ksub))
}

/** PQ encode with the codebooks riding the expression as ONE reference
  * object (`flat`: codeword floats at `((j·ksub)+cid)·dsub + t`, cid in
  * stored order) — the [[graft.functions.BpeEncode]] pattern applied to
  * quantization. Replaces the previous m·ksub-literal
  * `array_min(struct(sq_dist_f(slice…), cid)…)` tree, whose ~1000-node
  * plan cost SECONDS of analysis + janino compilation per query at any
  * data size (measured: 2.4 s to encode 2000 vectors, all overhead).
  * Arithmetic is bit-identical to that tree: per subspace, squared-L2 in
  * sequential double accumulation ([[SqDistF]]'s exact order), argmin
  * with ties to the smallest cid (array_min's lexicographic
  * (d, cid) order). NULL for a null or wrong-length vector. */
case class PqEncodeCodes(child: Expression, m: Int, ksub: Int, dsub: Int,
                         flat: Array[Float])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * dsub) return null
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var cid = 0
      while (cid < ksub) {
        var s = 0.0
        var t = 0
        val base = (j * ksub + cid) * dsub
        while (t < dsub) {
          val d = a.getFloat(j * dsub + t).toDouble - flat(base + t).toDouble
          s += d * d
          t += 1
        }
        if (s < bestD) { bestD = s; bestC = cid }
        cid += 1
      }
      codes(j) = bestC.toByte
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqFlat", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val cid = ctx.freshName("cid")
      val t = ctx.freshName("t"); val base = ctx.freshName("base")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $codes = new byte[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $cid = 0; $cid < $ksub; $cid++) {
         |      double $s = 0.0;
         |      final int $base = ($j * $ksub + $cid) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        final double $d =
         |          (double) $a.getFloat($j * $dsub + $t) - (double) $fl[$base + $t];
         |        $s += $d * $d;
         |      }
         |      if ($s < $bestD) { $bestD = $s; $bestC = $cid; }
         |    }
         |    $codes[$j] = (byte) $bestC;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** Per-query ADC lookup table with the codebooks as one reference object
  * (layout as [[PqEncodeCodes]]): entry `j·ksub + cid` =
  * dot(query subvector j, codeword cid) in [[DotProductF]]'s exact
  * sequential double order. Replaces the m·ksub-element
  * `array(dot_product_f(slice…)…)` literal tree on the query side —
  * same plan-size rationale as [[PqEncodeCodes]]. */
case class PqAdcTableExpr(child: Expression, m: Int, ksub: Int, dsub: Int,
                          flat: Array[Float])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != m * dsub) return null
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var cid = 0
      while (cid < ksub) {
        var dot = 0.0
        var t = 0
        val base = (j * ksub + cid) * dsub
        while (t < dsub) {
          dot += a.getFloat(j * dsub + t).toDouble * flat(base + t).toDouble
          t += 1
        }
        out(j * ksub + cid) = dot
        cid += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fl = ctx.addReferenceObj("pqFlat", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val cid = ctx.freshName("cid")
      val t = ctx.freshName("t"); val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[${m * ksub}];
         |  for (int $j = 0; $j < $m; $j++) {
         |    for (int $cid = 0; $cid < $ksub; $cid++) {
         |      double $dot = 0.0;
         |      final int $base = ($j * $ksub + $cid) * $dsub;
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        $dot += (double) $a.getFloat($j * $dsub + $t)
         |          * (double) $fl[$base + $t];
         |      }
         |      $out[$j * $ksub + $cid] = $dot;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTableExpr =
    copy(child = newChild)
}
