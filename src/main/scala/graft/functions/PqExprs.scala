package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd product-quantization kernels. The codebooks are DRIVER data —
  * they ride the expression as a referenced flat `double[]` (plus offset
  * tables), NOT as literal expression trees: the literal form (m·ks·dsub
  * ≈ 1024 doubles unrolled into nested folds) produced a codegen unit so
  * large that compiling it dominated the scan. These kernels compile to two
  * small primitive loops regardless of codebook size.
  *
  * Arithmetic is BIT-IDENTICAL to the declarative form they replace (and
  * thus to the DuckDB oracle): per-subspace squared distances accumulate in
  * index order from 0.0, the argmin keeps the FIRST minimum (strict `<` —
  * ties to the smaller dense index = smaller cluster id), and the ADC sum
  * adds subspaces in ascending order.
  *
  * Flat layout: centroid `c` of subspace `s` spans
  * `flat[(offsets(s)+c)*dsub + d], d < dsub`; `counts(s)` centroids per
  * subspace (codebooks may shrink when a Lloyd cluster empties).
  */
object PqLayout {
  def flatten(books: Seq[Array[Array[Double]]], dsub: Int)
      : (Array[Double], Array[Int], Array[Int]) = {
    val counts = books.map(_.length).toArray
    val offsets = counts.scanLeft(0)(_ + _).init
    val flat = new Array[Double](counts.sum * dsub)
    var p = 0
    books.foreach(_.foreach { arr =>
      System.arraycopy(arr, 0, flat, p, dsub); p += dsub
    })
    (flat, offsets, counts)
  }
}

/** `pq_encode(nv)` → ARRAY<INT>: the m dense codes of a unit-normalized
  * ARRAY<DOUBLE> vector. */
case class PqEncode(child: Expression, flat: Array[Double],
                    offsets: Array[Int], counts: Array[Int], dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"argument of $prettyName must be ARRAY<DOUBLE>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = offsets.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Int.MaxValue
      var bestD = Double.MaxValue
      var c = 0
      while (c < counts(s)) {
        val base = (offsets(s) + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(s * dsub + d) - flat(base + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val offRef = ctx.addReferenceObj("pqOff", offsets, "int[]")
    val cntRef = ctx.addReferenceObj("pqCnt", counts, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$offRef.length];
         |for (int $s = 0; $s < $offRef.length; $s++) {
         |  int $best = Integer.MAX_VALUE; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cntRef[$s]; $c++) {
         |    int $base = ($offRef[$s] + $c) * $dsub;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $v.getDouble($s * $dsub + $d) - $flatRef[$base + $d];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc(codes, qn)` → DOUBLE: Σ_s d²(query sub-vector s, assigned
  * centroid) — the asymmetric-distance scan kernel. */
case class PqAdc(left: Expression, right: Expression, flat: Array[Double],
                 offsets: Array[Int], dsub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (ARRAY<INT>, ARRAY<DOUBLE>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val m = offsets.length
    var total = 0.0
    var s = 0
    while (s < m) {
      val base = (offsets(s) + codes.getInt(s)) * dsub
      var acc = 0.0
      var d = 0
      while (d < dsub) {
        val diff = q.getDouble(s * dsub + d) - flat(base + d)
        acc += diff * diff
        d += 1
      }
      total += acc
      s += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val offRef = ctx.addReferenceObj("pqOff", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, (codes, q) => {
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val total = ctx.freshName("total")
      val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
      s"""
         |double $total = 0.0;
         |for (int $s = 0; $s < $offRef.length; $s++) {
         |  int $base = ($offRef[$s] + $codes.getInt($s)) * $dsub;
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dsub; $d++) {
         |    double $diff = $q.getDouble($s * $dsub + $d) - $flatRef[$base + $d];
         |    $acc += $diff * $diff;
         |  }
         |  $total += $acc;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
