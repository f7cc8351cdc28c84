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

  test("packPartition invariants hold on random workloads") {
    import graft.operators.CorpusOps.packPartition
    val seqLen = 512L
    val itemsGen = Gen.listOf(Gen.choose(1L, seqLen))
    samples(itemsGen, 200).foreach { toks =>
      // contract: best-fit-DECREASING — the caller presents tokens desc
      val items = toks.sorted(Ordering[Long].reverse)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = packPartition(items.iterator, seqLen, 0L).toList
      // every item assigned exactly once, tokens carried through intact
      assert(out.map(_._1).sorted == items.map(_._1).sorted)
      assert(out.map(r => r._1 -> r._2).toMap == items.toMap)
      val totals = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).values
      // no pack overflows
      assert(totals.forall(_ <= seqLen), s"toks=$toks")
      // density law of any-fit packers: at most ONE pack can be at most
      // half full (a second one's opening item would have fit the first)
      assert(totals.count(_ * 2 <= seqLen) <= 1, s"toks=$toks")
    }
  }

  test("packPartition isolates oversize items without disturbing the rest") {
    import graft.operators.CorpusOps.packPartition
    val seqLen = 100L
    val items = List((1L, 250L), (2L, 100L), (3L, 60L), (4L, 40L))
    val out = packPartition(items.iterator, seqLen, 1L << 40).toList
    val byBin = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    // the oversize and the exactly-full item each sit alone
    assert(byBin.values.count(_ == Set(1L)) == 1)
    assert(byBin.values.count(_ == Set(2L)) == 1)
    // the 60+40 pair shares a pack, and pack ids carry the namespace base
    assert(byBin.values.count(_ == Set(3L, 4L)) == 1)
    assert(out.forall(_._3 >= (1L << 40)))
  }
}
