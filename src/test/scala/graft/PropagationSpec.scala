package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSessions

/** Label-propagation core (d06): the pinned 3-round variant is the oracle
  * contract; the fixpoint variant must find true connected components on
  * graphs DEEPER than 3 hops and stop once no label changes. */
class PropagationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSessions.builder("local[4]", "4").appName("graft-prop").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Path graph 1-2-3-4-5 (diameter 4) plus an isolated pair 10-11. */
  private def fixtures = {
    import spark.implicits._
    val edgesDirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("s", "d")
    val edges = edgesDirected.union(edgesDirected.select(col("d"), col("s")))
    val labels0 = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L)
      .toDF("doc_id").select(col("doc_id"), col("doc_id").as("label"))
    (labels0, edges)
  }

  test("3 pinned rounds cannot close a diameter-4 path (oracle shape)") {
    val (labels0, edges) = fixtures
    val got = DedupQueries.propagate(labels0, edges, fixpoint = false, maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 is 4 hops from node 1: after 3 rounds it only reached label 2
    assert(got(5L) === 2L)
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L && got(4L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
    got.values // no cache leak check possible here; propagate unpersisted internally
  }

  test("fixpoint converges on a diameter-4 path and stops changing") {
    val (labels0, edges) = fixtures
    val got = DedupQueries.propagate(labels0, edges, fixpoint = true, maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_) == 1L))
    assert(got(10L) === 10L && got(11L) === 10L)
  }

  test("propagate releases its caches (no storage leak across generations)") {
    val (labels0, edges) = fixtures
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = DedupQueries.propagate(labels0, edges, fixpoint = true, maxRounds = 50)
    val during = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL generation may remain cached
    assert(during <= before + 1)
    out.unpersist()
  }
}
