package graft

import graft.functions.SubwordBpe
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based pins for the pure JVM kernels (no SparkSession — these
  * run in milliseconds and cover the input space the example-based specs
  * can't enumerate). Native ScalaCheck `Properties`, picked up by sbt's
  * ScalaCheck test framework alongside the ScalaTest suites.
  */
object KernelPropertySpec extends Properties("SubwordBpe.countPieces") {

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaChar)
  } yield cs.mkString

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 20)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
  } yield ws.mkString(sep)

  property("additive over whitespace concatenation") =
    forAll(text, text) { (a, b) =>
      SubwordBpe.countPieces(u(a + " " + b)) ==
        SubwordBpe.countPieces(u(a)) + SubwordBpe.countPieces(u(b))
    }

  property("bounded: #words <= pieces <= #non-ws chars") = forAll(text) { t =>
    val words = t.split("\\s+").filter(_.nonEmpty)
    val pieces = SubwordBpe.countPieces(u(t))
    pieces >= words.length && pieces <= words.map(_.length).sum
  }

  property("case-insensitive, whitespace-shape-invariant") = forAll(text) { t =>
    val norm = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
    SubwordBpe.countPieces(u(t.toUpperCase)) == SubwordBpe.countPieces(u(t)) &&
      SubwordBpe.countPieces(u(norm)) == SubwordBpe.countPieces(u(t))
  }

  property("null / whitespace-only count 0") = Prop.all(
    Prop(SubwordBpe.countPieces(null) == 0L),
    forAll(Gen.oneOf("", " ", "\t\n", "   ")) { s =>
      SubwordBpe.countPieces(u(s)) == 0L
    })
}
