package graft.iceberg

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Puffin container + deletion-vector-v1 blob framing round trips. */
class PuffinSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private def tmp(): Path =
    new Path(Files.createTempDirectory("puffin").toString, "dv.puffin")

  test("DV blob framing round-trips (length, magic, crc)") {
    val pos = Array(0L, 1L, 5L, 4096L, (1L << 33) + 7)
    val bytes = Puffin.dvBlobBytes(pos)
    // u32 BE length of magic+vector, then magic D1 D3 39 64
    val len = java.nio.ByteBuffer.wrap(bytes).getInt
    assert(len == bytes.length - 8)
    assert((bytes(4) & 0xff) == 0xD1 && (bytes(5) & 0xff) == 0xD3 &&
      (bytes(6) & 0xff) == 0x39 && (bytes(7) & 0xff) == 0x64)
    assert(Puffin.dvBlobPositions(bytes).sameElements(pos))
  }

  test("corrupted blob fails the CRC, not the decode") {
    val bytes = Puffin.dvBlobBytes(Array(1L, 2L, 3L))
    bytes(bytes.length - 6) = (bytes(bytes.length - 6) ^ 0x01).toByte // flip a vector bit
    val e = intercept[IllegalArgumentException](Puffin.dvBlobPositions(bytes))
    assert(e.getMessage.contains("CRC"))
  }

  test("multi-blob puffin file: footer metadata + offset-addressed reads") {
    val p = tmp()
    val blobs = Seq(
      Puffin.DVBlob("data/f1.parquet", Array(3L, 1L, 2L, 2L)), // unsorted+dup in
      Puffin.DVBlob("data/f2.parquet", (0L until 5000L).toArray),
      Puffin.DVBlob("data/f3.parquet", Array(1L << 40)))
    val metas = Puffin.writeDVFile(p, conf, blobs, snapshotId = 7, sequenceNumber = 3)
    assert(metas.map(_._1) == blobs.map(_.referencedDataFile))
    assert(metas.map(_._3) == Seq(3L, 5000L, 1L)) // cardinalities deduped
    // footer read-back agrees with the write-side metadata
    val footer = Puffin.readFooter(p, conf)
    assert(footer.map(m => (m.blobType, m.offset, m.length)) ==
      metas.map(m => (m._2.blobType, m._2.offset, m._2.length)))
    assert(footer.forall(_.snapshotId == 7) && footer.forall(_.sequenceNumber == 3))
    assert(footer.map(_.properties("referenced-data-file")) == blobs.map(_.referencedDataFile))
    assert(footer.head.properties("cardinality") == "3")
    // manifest-style offset/length reads, no footer needed
    assert(Puffin.readDV(p, conf, metas(0)._2.offset, metas(0)._2.length)
      .sameElements(Array(1L, 2L, 3L)))
    assert(Puffin.readDV(p, conf, metas(1)._2.offset, metas(1)._2.length).length == 5000)
    assert(Puffin.readDV(p, conf, metas(2)._2.offset, metas(2)._2.length)
      .sameElements(Array(1L << 40)))
  }

  test("non-puffin file is rejected loudly") {
    val p = tmp()
    val os = p.getFileSystem(conf).create(p, true)
    os.write(Array.fill[Byte](64)(0x2A)); os.close()
    val e = intercept[IllegalArgumentException](Puffin.readFooter(p, conf))
    assert(e.getMessage.contains("magic"))
  }
}
