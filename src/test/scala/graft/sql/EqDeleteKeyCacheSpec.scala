package graft.sql

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** EqDeleteKeyCache granularity (VERDICT r15 #7): delete keys cache per
  * FILE, so two splits whose applicable-delete lists merely OVERLAP
  * (consecutive CDC epochs) re-read only the files not yet cached —
  * the old whole-list cache key re-read every file in the set. */
class EqDeleteKeyCacheSpec extends AnyFunSuite {

  private val keySchema = StructType(Seq(StructField("k", LongType, nullable = false)))

  /** Serves `rowsPerFile` keys derived from the file path; counts opens. */
  private class CountingFactory extends PartitionReaderFactory {
    val opens = new ConcurrentHashMap[String, AtomicInteger]()
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val files = p.asInstanceOf[FilePartition].files
      assert(files.length === 1, "per-file cache must read one file per open")
      val path = files.head.filePath.toString
      opens.computeIfAbsent(path, _ => new AtomicInteger).incrementAndGet()
      val base = path.filter(_.isDigit).toLong * 100
      var i = -1
      new PartitionReader[InternalRow] {
        override def next(): Boolean = { i += 1; i < 3 }
        override def get(): InternalRow =
          new GenericInternalRow(Array[Any](base + i))
        override def close(): Unit = ()
      }
    }
  }

  test("overlapping delete sets re-read only uncached files; unions stay exact") {
    val fac = new CountingFactory
    // unique sizes so these paths can't collide with another suite's keys
    val a = ("edkc/del1.parquet", 101L)
    val b = ("edkc/del2.parquet", 102L)
    val c = ("edkc/del3.parquet", 103L)

    val s1 = EqDeleteKeyCache.load(Array(a, b), fac, keySchema)
    assert(s1.size === 6, "union of both files' keys")
    assert(fac.opens.size === 2)

    // second split shares file b: only c is a fresh read
    val s2 = EqDeleteKeyCache.load(Array(b, c), fac, keySchema)
    assert(s2.size === 6)
    assert(fac.opens.get(a._1).get === 1)
    assert(fac.opens.get(b._1).get === 1, "shared file must come from cache")
    assert(fac.opens.get(c._1).get === 1)

    // membership across the union: keys from BOTH constituent files
    def has(set: java.util.HashSet[InternalRow], v: Long): Boolean = {
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(keySchema)
      set.contains(proj(new GenericInternalRow(Array[Any](v))))
    }
    assert(has(s1, 100L) && has(s1, 202L))
    assert(has(s2, 200L) && has(s2, 301L))
    assert(!has(s2, 100L), "file a's keys must not leak into split 2")

    // exact repeat of split 1: zero new opens
    EqDeleteKeyCache.load(Array(a, b), fac, keySchema)
    assert(fac.opens.values().stream().mapToInt(_.get).sum === 3)
  }
}
