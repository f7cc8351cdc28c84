package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SchemaReconciler._

/** Property tests for the pure (driver-side) laws from SURVEY.md §5.2,
  * using ScalaCheck generators sampled under a fixed seed (the
  * scalatestplus bridge isn't in the offline cache). Spark-side laws
  * (diff involution, join decomposition) are single-shot dataset checks
  * in their engine specs. */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val headerGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '-', '(', ')', '%', ' ', '\r', '\n')))
      .map(_.mkString)

  test("normSpace re-application only collapses punct-created space runs") {
    // Not fully idempotent BY REFERENCE DESIGN: Upload.py:137-145 drops
    // punctuation AFTER collapsing whitespace, so "a ( b" -> "a  b" keeps
    // an interior double space. Re-normalizing collapses exactly those.
    samples(headerGen).foreach { s =>
      val once = normSpace(s)
      assert(normSpace(once) == once.replaceAll(" {2,}", " "),
        s"input: ${s.toList}")
    }
  }

  test("normSnake is idempotent") {
    samples(headerGen).foreach { s =>
      assert(normSnake(normSnake(s)) == normSnake(s), s"input: ${s.toList}")
    }
  }

  test("normSpace output alphabet is [a-z0-9 ], trimmed") {
    samples(headerGen).foreach { s =>
      val n = normSpace(s)
      assert(n.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == ' '))
      assert(n == n.trim)
    }
  }

  test("letter <-> ordinal bijection") {
    samples(Gen.choose(1, 20000)).foreach { n =>
      assert(letterToOrdinal(ordinalToLetter(n)) == n)
    }
  }

  test("matchColumns output is a subset preserving source order") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val pairGen = for {
      src <- Gen.listOf(nameGen); tgt <- Gen.listOf(nameGen)
    } yield (src, tgt)
    samples(pairGen, 200).foreach { case (src, tgt) =>
      val m = matchColumns(src, tgt)
      assert(m.map(_._1).forall(src.contains))
      assert(m.map(_._2).forall(tgt.contains))
      val pos = m.map(p => src.indexOf(p._1))
      assert(pos == pos.sorted)
    }
  }
}
