package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-rehearsal generator's text-perturbation contract: both
  * modes must be bijections on the alphabet (token lengths/counts
  * preserved), deterministic, and `perm` must not repeat within any
  * realistic factor (caesar's period 26 is the documented
  * duplicate-density artifact the mode exists to remove).
  */
class ScaleUpSpec extends AnyFunSuite {
  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  test("caesar: rotation, period exactly 26") {
    assert(ScaleUp.replicaAlphabet("caesar", 0) == alphabet)
    assert(ScaleUp.replicaAlphabet("caesar", 1) == alphabet.drop(1) + "a")
    assert(ScaleUp.replicaAlphabet("caesar", 27) == ScaleUp.replicaAlphabet("caesar", 1))
  }

  test("perm: deterministic bijection per replica, identity at k=0, no short period") {
    assert(ScaleUp.replicaAlphabet("perm", 0) == alphabet)
    val seen = scala.collection.mutable.Set.empty[String]
    for (k <- 0 to 200) {
      val img = ScaleUp.replicaAlphabet("perm", k)
      assert(img.sorted == alphabet, s"k=$k not a bijection: $img")
      assert(img == ScaleUp.replicaAlphabet("perm", k), s"k=$k not deterministic")
      assert(seen.add(img), s"k=$k repeats an earlier replica's permutation (period artifact)")
    }
  }

  test("unknown mode fails loudly") {
    intercept[IllegalArgumentException](ScaleUp.replicaAlphabet("rot13", 1))
  }

  test("ruleGeometry: sqrt-n lists, 10% probe, floors at (16, 4)") {
    assert(graft.ml.Similarity.ruleGeometry(100L) == ((16, 4)))
    assert(graft.ml.Similarity.ruleGeometry(2000L) == ((45, 5)))
    assert(graft.ml.Similarity.ruleGeometry(200000L) == ((448, 45)))
  }

  test("rulePlanes: bucket space tracks the corpus, floor 8") {
    assert(graft.ml.Similarity.rulePlanes(100L) == 8)
    assert(graft.ml.Similarity.rulePlanes(2000L) == 11)
    assert(graft.ml.Similarity.rulePlanes(200000L) == 18)
  }
}
