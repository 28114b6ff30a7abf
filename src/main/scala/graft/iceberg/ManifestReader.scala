package graft.iceberg

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration

import IcebergModel._

/** Driver-side Avro reads of manifest lists and manifests using *partial*
  * reader schemas (Avro schema-resolution projection) — the analogue of the
  * reference's avro-cpp reads (duckdb_iceberg `src/common/iceberg.cpp:38-91`,
  * schemas `src/include/iceberg_types.hpp:60-77,122-155`).
  */
object ManifestReader {

  // Partial reader schemas: only the fields the engine consumes. Avro
  // resolves reader-vs-writer by field name and skips the rest.
  private val manifestListV2 = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"}]}""")

  private val manifestListV1 = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"}]}""")

  private val manifestEntryV2 = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int"},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private val manifestEntryV1 = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private def readRecords(path: String, conf: Configuration, readerSchema: Schema): Seq[GenericRecord] = {
    val bytes = IcebergIO.readBytes(path, conf)
    val datumReader = new GenericDatumReader[GenericRecord](null, readerSchema)
    val reader = new DataFileReader[GenericRecord](new SeekableByteArrayInput(bytes), datumReader)
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.result()
    } finally reader.close()
  }

  def readManifestList(path: String, conf: Configuration, formatVersion: Int): Seq[Manifest] =
    if (formatVersion == 1)
      readRecords(path, conf, manifestListV1).map { r =>
        Manifest(r.get("manifest_path").toString, sequenceNumber = 0L, content = 0)
      }
    else
      readRecords(path, conf, manifestListV2).map { r =>
        Manifest(
          r.get("manifest_path").toString,
          r.get("sequence_number").asInstanceOf[Long],
          r.get("content").asInstanceOf[Int])
      }

  def readManifestEntries(path: String, conf: Configuration, formatVersion: Int): Seq[ManifestEntry] = {
    val schema = if (formatVersion == 1) manifestEntryV1 else manifestEntryV2
    readRecords(path, conf, schema).map { r =>
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      ManifestEntry(
        status = r.get("status").asInstanceOf[Int],
        content = if (formatVersion == 1) 0 else df.get("content").asInstanceOf[Int],
        filePath = df.get("file_path").toString,
        fileFormat = df.get("file_format").toString,
        recordCount = df.get("record_count").asInstanceOf[Long])
    }
  }

  /** Parallelism / timeout knobs for the concurrent manifest fetch. An
    * unbounded pool + infinite wait over an object store is a driver hang
    * waiting to happen; these are deliberate, conf-overridable bounds. */
  val FetchParallelismKey = "spark.graft.iceberg.manifestFetchParallelism"
  val FetchTimeoutSecKey = "spark.graft.iceberg.manifestFetchTimeoutSec"
  private val DefaultFetchParallelism = 16
  private val DefaultFetchTimeoutSec = 300L

  /** IcebergTable::Load (iceberg.cpp:15-36): manifest list, then every
    * manifest, eagerly, with optional moved-path re-anchoring. Manifests
    * are fetched concurrently — a 100 TB table has O(100k) entries across
    * many manifest files and, over an object store, sequential driver-side
    * reads would dominate planning time. The fetch runs on a dedicated
    * bounded pool (not the global EC, which unrelated driver code shares)
    * and fails with a clear timeout instead of hanging the driver. */
  def loadTable(
      tablePath: String,
      snapshot: Snapshot,
      conf: Configuration,
      allowMovedPaths: Boolean): TableMeta = {
    val listPath =
      if (allowMovedPaths) IcebergIO.fullPath(tablePath, snapshot.manifestList)
      else snapshot.manifestList
    val manifests = readManifestList(listPath, conf, snapshot.formatVersion)

    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val parallelism = math.max(1,
      conf.getInt(FetchParallelismKey, DefaultFetchParallelism))
    val timeout = conf.getLong(FetchTimeoutSecKey, DefaultFetchTimeoutSec).seconds
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, manifests.size)),
      (r: Runnable) => {
        val t = new Thread(r, "graft-manifest-fetch")
        t.setDaemon(true)
        t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val entries = Await.result(
        Future.traverse(manifests) { m =>
          Future {
            val mPath =
              if (allowMovedPaths) IcebergIO.fullPath(tablePath, m.manifestPath)
              else m.manifestPath
            m -> readManifestEntries(mPath, conf, snapshot.formatVersion)
          }
        }, timeout)
      TableMeta(tablePath, snapshot, entries)
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new java.io.IOException(
          s"timed out after $timeout fetching ${manifests.size} manifest file(s) " +
          s"for $tablePath (raise $FetchTimeoutSecKey)")
    } finally pool.shutdownNow()
  }
}
