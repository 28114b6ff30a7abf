package graft.iceberg

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the portable roaring64 codec under Iceberg v3
  * deletion vectors. Deletion vectors silently drop rows, so a codec bug
  * is a silent-wrong-answer bug — the generators bias toward the format's
  * edge shapes: container-type boundaries (4096 cardinality), dense runs
  * (run-container election), bucket boundaries at 2^16 and 2^32, and the
  * offset-index threshold (4 containers). */
object RoaringSpec extends Properties("iceberg.roaring64") {

  private def roundTrip(xs: Seq[Long]): Boolean = {
    val in = xs.distinct.sorted.toArray
    Roaring64.deserialize(Roaring64.serialize(in)).sameElements(in)
  }

  // sparse values over the full u64-positive domain (multi-bucket)
  property("sparse round trip") = forAll(
    Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))) { xs => roundTrip(xs) }

  // dense runs: elect run containers
  property("dense runs round trip") = forAll(
    Gen.chooseNum(0L, 1L << 40), Gen.chooseNum(1, 70000)) { (start, len) =>
    roundTrip(start until (start + len))
  }

  // cardinality straddling the array/bitmap boundary, with gaps so runs
  // don't win (every other value → nRuns == card → array or bitmap)
  property("array/bitmap boundary") = forAll(
    Gen.chooseNum(4090, 4102)) { card =>
    roundTrip((0 until card).map(i => i.toLong * 2))
  }

  // values packed around the 2^16 container and 2^32 bucket boundaries
  property("boundary straddles") = forAll(
    Gen.oneOf(1L << 16, 1L << 32, (1L << 32) + (1L << 16)),
    Gen.listOf(Gen.chooseNum(-64, 64))) { (edge, offs) =>
    roundTrip(offs.map(edge + _).filter(_ >= 0))
  }

  // mixed shape: runs + sparse + dense in distinct buckets — exercises the
  // run bitset and the ≥4-container offset index together
  property("mixed containers round trip") = forAll(
    Gen.listOf(Gen.chooseNum(0L, 1000L))) { sparse =>
    val runs = 100000L until 103000L
    val dense = (0 until 5000).map(i => (1L << 33) + i * 2)
    roundTrip(sparse ++ runs ++ dense)
  }

  property("empty round trip") = roundTrip(Seq.empty)

  property("single value round trip") = forAll(
    Gen.chooseNum(0L, Long.MaxValue)) { v => roundTrip(Seq(v)) }

  // serialize sorts and dedupes unsorted input
  property("unsorted input normalizes") = forAll(
    Gen.listOf(Gen.chooseNum(0L, 1L << 20))) { xs =>
    Roaring64.deserialize(Roaring64.serialize(xs.toArray))
      .sameElements(xs.distinct.sorted.toArray[Long])
  }
}
