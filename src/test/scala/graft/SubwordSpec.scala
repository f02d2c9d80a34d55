package graft

import graft.functions.SubwordBpe
import graft.plans.SubwordExpression
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The table-driven subword tokenizer (q61): production scan vs an
  * independently-shaped greedy reference, pinned hand-derived counts,
  * null behavior, and whole-stage-codegen participation.
  */
class SubwordSpec extends SparkSpec {
  import sqlImplicits._

  /** Independent reference: per-token recursion that picks the longest
    * vocab prefix via filter/sortBy (different code shape from the
    * production linear scan — agreement is meaningful).
    */
  private def refCount(text: String): Long = {
    def pieces(w: String): Long =
      if (w.isEmpty) 0L
      else SubwordBpe.vocab.filter(w.startsWith).sortBy(-_.length).headOption match {
        case Some(p) => 1L + pieces(w.substring(p.length))
        case None => 1L + pieces(w.substring(Character.charCount(w.codePointAt(0))))
      }
    text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).map(pieces).sum
  }

  test("countPieces matches the independent greedy reference on corpus + edges") {
    val texts = Tables.documents(spark, sf()).select("text")
      .limit(50).collect().map(_.getString(0))
    texts.foreach { t =>
      assert(SubwordBpe.countPieces(UTF8String.fromString(t)) == refCount(t),
        s"mismatch on: ${t.take(60)}")
    }
    Seq("", "   ", "\t\n", "the", "THE The tHe", "zzz", "a  b\tc",
      "naïve café 文档") // non-vocab and non-ASCII fall back to 1 piece/code point
      .foreach(t =>
        assert(SubwordBpe.countPieces(UTF8String.fromString(t)) == refCount(t),
          s"edge: '$t'"))
  }

  test("greedy longest-prefix segmentation: pinned counts") {
    // hand-derived with the checked-in vocab:
    //   the                      -> [the]                  = 1
    //   window -> wi|nd|ow       = 3
    //   table  -> ta|b|le        = 3  (no piece starts 'bl')
    //   customer -> c|us|to|me|r = 5
    val pinned = Seq("the" -> 1L, "window" -> 3L, "table" -> 3L, "customer" -> 5L)
    pinned.foreach { case (w, n) =>
      assert(SubwordBpe.countPieces(UTF8String.fromString(w)) == n,
        s"'$w' expected $n")
    }
    // counts are additive over whitespace tokens
    assert(SubwordBpe.countPieces(UTF8String.fromString("the window table customer")) == 12L)
  }

  test("expression: null in, null out; non-null typed long") {
    val df = Seq(Some("the table"), None).toDF("text")
      .select(SubwordExpression.subwordPieces(col("text")).as("pieces"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 4L) // the=1 + table=3
    assert(rows(1).isNullAt(0), "null text must yield null")
  }

  test("SubwordPieceCount participates in whole-stage codegen") {
    val exec = Tables.documents(spark, sf()).limit(10)
      .select(SubwordExpression.subwordPieces(col("text")))
      .queryExecution.executedPlan
    val hasCodegenStage = exec.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasCodegenStage, s"expected a WholeStageCodegen stage in:\n$exec")
  }
}
