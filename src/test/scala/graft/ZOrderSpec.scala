package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** The Morton interleave behind `IcebergWriter.zorder`, pinned against a
  * bit-by-bit reference implementation: the shift/mask expression chain
  * must order points exactly as textbook Morton order does. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-zorder").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Textbook Morton: interleave bit i of each coordinate. */
  private def mortonRef(coords: Seq[Long], bits: Int): Long = {
    var r = 0L
    for (i <- 0 until bits; (c, d) <- coords.zipWithIndex)
      r |= ((c >> i) & 1L) << (i * coords.size + d)
    r
  }

  private def sparkZ(points: Seq[Seq[Long]], max: Long): Seq[Long] = {
    import spark.implicits._
    val n = points.head.size
    val df = points.map {
      case Seq(a, b) => (a, b, 0L)
      case Seq(a, b, c) => (a, b, c)
    }.toDF("a", "b", "c")
    val cols = Seq(col("a"), col("b"), col("c")).take(n)
    val zv = ZOrder.zvalue(cols, Seq.fill(n)(0L), Seq.fill(n)(max))
    df.withColumn("zv", zv).select("zv").collect().map(_.getLong(0)).toSeq
  }

  test("2-column z-values rank a 4x4 grid exactly like textbook Morton order") {
    val pts = for { x <- 0L until 4L; y <- 0L until 4L } yield Seq(x, y)
    val zs = sparkZ(pts, max = 3L)
    val sparkRank = pts.zip(zs).sortBy(_._2).map(_._1)
    val refRank = pts.sortBy(p => mortonRef(p, bits = 2))
    assert(sparkRank === refRank)
  }

  test("3-column z-values rank a 4x4x4 grid exactly like textbook Morton order") {
    val pts = for { x <- 0L until 4L; y <- 0L until 4L; z <- 0L until 4L }
      yield Seq(x, y, z)
    val zs = sparkZ(pts, max = 3L)
    val sparkRank = pts.zip(zs).sortBy(_._2).map(_._1)
    val refRank = pts.sortBy(p => mortonRef(p, bits = 2))
    assert(sparkRank === refRank)
  }

  test("quadrant dominance holds for random points (deterministic seed)") {
    val rnd = new scala.util.Random(42)
    val max = 1000000L
    val pts = Seq.fill(500)(Seq(rnd.nextLong(max + 1), rnd.nextLong(max + 1)))
    val zs = sparkZ(pts, max)
    val mid = max / 2
    def quadrant(p: Seq[Long]): Int =
      (if (p(1) > mid) 2 else 0) + (if (p(0) > mid) 1 else 0)
    // the interleave puts y's top bit above x's: quadrant label order
    // (y-major) must match z-value order across quadrants
    val byQ = pts.zip(zs).groupBy { case (p, _) => quadrant(p) }
    for (q1 <- byQ.keys; q2 <- byQ.keys if q1 < q2) {
      val max1 = byQ(q1).map(_._2).max
      val min2 = byQ(q2).map(_._2).min
      assert(max1 < min2, s"quadrant $q1 overlaps $q2")
    }
  }
}
