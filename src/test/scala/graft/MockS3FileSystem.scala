package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A fake object-store scheme for end-to-end tests: `mock-s3://bucket/p`
  * maps to local path `/p`, but every Path the engine sees — table roots,
  * manifest strings, `_metadata.file_path` provenance URIs — carries a
  * scheme AND an authority component, exactly the seams where local-path
  * assumptions break against real S3 (the reference runs its oracle suite
  * over minio for the same reason,
  * `test/sql/iceberg_scan_generated_data_0_01_remote.test_slow:5-27`).
  * Registered per-session via `spark.hadoop.fs.mock-s3.impl`. */
class MockS3FileSystem extends RawLocalFileSystem {
  private var myUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    myUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    super.initialize(name, conf)
  }

  // called during construction (working-dir qualification) before
  // initialize() runs — fall back to a bare scheme URI until then
  override def getUri: URI =
    if (myUri == null) URI.create(getScheme + ":///") else myUri

  override def getScheme: String = "mock-s3"

  /** RawLocalFileSystem's status objects load permissions LAZILY via
    * `new java.io.File(path.toUri)`, which rejects non-file schemes —
    * replace them with plain eager FileStatus (like real object stores,
    * which have no POSIX permissions anyway). */
  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, null, null, null, s.getPath)

  override def getFileStatus(f: Path): FileStatus =
    sanitize(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(sanitize)
}

/** A mock object store that REQUIRES a session token in its Hadoop
  * configuration — the sandbox analogue of an S3 bucket readable only
  * with catalog-vended credentials (RestCatalog access delegation). */
class CredentialedMockS3FileSystem extends MockS3FileSystem {
  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    if (conf.get("fs.vended-s3.session.token") != "vended-token")
      throw new java.io.IOException(
        "vended-s3: access denied (no valid session token in the configuration)")
    super.initialize(name, conf)
  }
  override def getUri: URI =
    if (super.getUri.getScheme == "mock-s3") URI.create("vended-s3:///")
    else super.getUri
  override def getScheme: String = "vended-s3"
}

/** A mock object store that COUNTS every metadata/data round trip —
  * `getFileStatus`, `listStatus`, `open` — so specs can pin exactly
  * which storage calls a code path makes. The 100-TB concern: a cold
  * scan that re-stats files the manifests already measured turns
  * planning into minutes of object-store round trips; the counter is
  * how [[ZeroStatPlanningSpec]] proves the scan never does. */
class CountingMockFileSystem extends MockS3FileSystem {
  override def getScheme: String = "counting"

  override def getFileStatus(f: Path): FileStatus = {
    CountingMockFileSystem.record("stat", f)
    super.getFileStatus(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    CountingMockFileSystem.record("list", f)
    super.listStatus(f)
  }

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    CountingMockFileSystem.record("open", f)
    super.open(f, bufferSize)
  }
}

object CountingMockFileSystem {
  import java.util.concurrent.ConcurrentLinkedQueue
  private val calls = new ConcurrentLinkedQueue[(String, String)]()

  private[graft] def record(op: String, f: Path): Unit =
    calls.add((op, f.toString))

  def reset(): Unit = calls.clear()

  def snapshot(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    calls.asScala.toSeq
  }
}
