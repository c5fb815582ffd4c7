package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §2.11, §7.4 "optional future"):
  * the tokenizer exposed to SQL as a generator, and the BM25 partial as a
  * codegen'd scalar — so the engine's exact token/score spec is usable
  * from `spark.sql` pipelines without leaving Catalyst.
  */

/** `code_tokens(str)` — generator producing one row per code token of the
  * input (the engine's CodeTokenizer spec: splits, camelCase/snake_case,
  * lowercase). The SQL-facing analog of tantivy's tokenizer pipeline.
  */
case class CodeTokens(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType =
    StructType(StructField("token", StringType, nullable = false) :: Nil)
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else graft.tokenize.CodeTokenizer.tokenize(v.toString)
      .map(t => InternalRow(UTF8String.fromString(t)))
  }
  override protected def withNewChildInternal(c: Expression): CodeTokens =
    copy(child = c)
}

/** `code_trigrams(str)` — distinct lowercase trigrams as an array (the
  * "g:" namespace content, un-prefixed): the regex-prefilter feature as a
  * plain SQL function.
  */
case class CodeTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.tokenize.CodeTokenizer
      .distinctTrigrams(v.toString).sorted
      .map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): CodeTrigrams =
    copy(child = c)
}

/** `bm25_partial(tf, normId, weight, avgdl)` — the engine's exact f32
  * per-(term,doc) BM25 partial (quantized norms, tantivy 0.21 semantics)
  * with real whole-stage codegen: the generated code calls the same static
  * scorer the distributed engine and the oracle share.
  */
case class Bm25Partial(tf: Expression, normId: Expression,
                       weight: Expression, avgdl: Expression)
    extends QuaternaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def first: Expression = tf
  override def second: Expression = normId
  override def third: Expression = weight
  override def fourth: Expression = avgdl
  // declared input types insert the byte→int / double→float casts that
  // interpreted eval needs (nullSafeEval hard-casts; a TINYINT normId
  // column would CCE there while codegen silently widened it)
  override def inputTypes: Seq[DataType] =
    Seq(IntegerType, IntegerType, FloatType, FloatType)
  override def dataType: DataType = FloatType
  override def nullable: Boolean =
    tf.nullable || normId.nullable || weight.nullable || avgdl.nullable

  override protected def nullSafeEval(tfV: Any, normIdV: Any, weightV: Any,
                                      avgdlV: Any): Any =
    GraftFunctions.bm25Partial(tfV.asInstanceOf[Int],
      normIdV.asInstanceOf[Int], weightV.asInstanceOf[Float],
      avgdlV.asInstanceOf[Float])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tfC, nC, wC, aC) =>
      s"${ev.value} = graft.functions.GraftFunctions.bm25Partial($tfC, $nC, $wC, $aC);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): Bm25Partial = Bm25Partial(f, s, t, q)
}

object GraftFunctions {
  /** static entry shared by interpreted eval and generated code */
  def bm25Partial(tf: Int, normId: Int, weight: Float, avgdl: Float): Float =
    graft.score.Bm25.partial(weight, tf,
      graft.engine.Searcher.normCacheFor(avgdl)(normId & 0xff))

  // Column-level access goes through the registered SQL names:
  //   org.apache.spark.sql.functions.expr("code_tokens(content)")
  // (the Expression→Column constructor is private[sql] in Spark 4).

  private val registrations: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "code_tokens" -> (es => CodeTokens(es.head)),
      "code_trigrams" -> (es => CodeTrigrams(es.head)),
      "bm25_partial" -> (es => Bm25Partial(es(0), es(1), es(2), es(3))))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — injects
  * the functions at session build (SURVEY §7.4 extension mechanism).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("code_tokens"),
      new ExpressionInfo(classOf[CodeTokens].getName, "code_tokens"),
      es => CodeTokens(es.head)))
    e.injectFunction((FunctionIdentifier("code_trigrams"),
      new ExpressionInfo(classOf[CodeTrigrams].getName, "code_trigrams"),
      es => CodeTrigrams(es.head)))
    e.injectFunction((FunctionIdentifier("bm25_partial"),
      new ExpressionInfo(classOf[Bm25Partial].getName, "bm25_partial"),
      es => Bm25Partial(es(0), es(1), es(2), es(3))))
  }
}
