package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** C9's analyzer pair as ONE native Catalyst expression: a single
  * tokenization pass feeds both [[Vader]] and [[TextBlobOps]], and the
  * result is an InternalRow struct — no ScalaUDF encoder boundary, no
  * double split (the UDF pair tokenizes the text twice).
  *
  * Output struct: compound, positive, negative, neutral (VADER) +
  * polarity, subjectivity (TextBlob). Null/empty input → the
  * analyzers' neutral defaults (never null — matches the reference's
  * total error handling, sentiment_analysis.py:239-247/268-272).
  */
case class AnalyzeSentiment(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AnalyzeSentiment.schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"analyze_sentiment requires a string argument, got ${other.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val text = if (v == null) null else v.asInstanceOf[UTF8String].toString
    val vs = Vader.score(text)
    val ts = TextBlobOps.score(text)
    InternalRow(vs.compound, vs.positive, vs.negative, vs.neutral, ts.polarity, ts.subjectivity)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AnalyzeSentiment {
  val schema: StructType = StructType(Seq(
    StructField("compound", DoubleType, nullable = false),
    StructField("positive", DoubleType, nullable = false),
    StructField("negative", DoubleType, nullable = false),
    StructField("neutral", DoubleType, nullable = false),
    StructField("polarity", DoubleType, nullable = false),
    StructField("subjectivity", DoubleType, nullable = false)))

  def analyze_sentiment(c: Column): Column =
    GraftColumnBridge.column(AnalyzeSentiment(GraftColumnBridge.expression(c)))
}
