package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (the UDTF extension point, SURVEY.md §2
  * "UDF/UDAF/UDTF"): expands a token array into (pos, shingle) rows for a
  * configurable n — the generalization of the fixed shingles3 helper.
  *
  * A Generator beats the compose-then-explode formulation
  * (`posexplode(transform(sequence(...), ...))`) by never materializing
  * the intermediate shingle array per row: each output row is emitted
  * straight off the token array. Planned through the same `Generate`
  * node as built-in explode, so column pruning and filter pushdown around
  * it behave identically. One custom operator of each extension tier now
  * exists in the codebase (Expression, Aggregator, LogicalPlan+Exec,
  * Generator, mapPartitions).
  *
  * Reference behavior anchor: trace-converter.py has no UDTF surface; the
  * semantics serve the Tier C dedup path (SURVEY §2 C2).
  */
case class ShingleGeneratorExpr(tokens: Expression, n: Int)
  extends Expression with CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens)
  override def position: Boolean = true
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_gen requires n >= 1, got $n")
    else tokens.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_gen expects array<string>, got ${other.sql}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val sb = new java.lang.StringBuilder
      (0 to arr.numElements() - n).iterator.map { i =>
        sb.setLength(0)
        var j = 0
        var first = true
        while (j < n) {
          // null elements are skipped, matching concat_ws / shingles3
          val t = arr.getUTF8String(i + j)
          if (t != null) {
            if (!first) sb.append(' ')
            sb.append(t.toString)
            first = false
          }
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = collectionType
}

object ShingleGenerator {
  import org.apache.spark.sql.graftshim.Shim.{column, expression}
  /** DataFrame surface: `df.select(col("id"), shingle_gen(col("tk"), 3))`
    * yields (pos, shingle) rows per input row, like posexplode. */
  def shingle_gen(tokens: Column, n: Int): Column =
    column(ShingleGeneratorExpr(expression(tokens), n))
}
