package graft.iceberg

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import IcebergModel._

/** File access + version discovery on the Hadoop FileSystem API (gives the
  * local/S3 transparency the reference gets from DuckDB's FileSystem+httpfs).
  *
  * Semantics mirror duckdb_iceberg `src/common/utils.cpp:9-36` and
  * `src/common/iceberg.cpp:172-312`.
  */
object IcebergIO {

  /** Path string as the filesystem qualifies it (scheme + authority) —
    * the bridge between manifest path strings and the qualified URIs
    * Spark's `_metadata.file_path` reports. One definition, shared by
    * every read/write site that joins across the two forms. */
  def qualified(p: String, conf: org.apache.hadoop.conf.Configuration): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(conf).makeQualified(hp).toString
  }


  def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def readString(path: String, conf: Configuration, gzip: Boolean = false): String = {
    val raw = readBytes(path, conf)
    val bytes =
      if (!gzip) raw
      else {
        val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
        try {
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
      }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Re-anchor a possibly-moved absolute path at the table root by splicing
    * at its `/metadata/` or `/data/` segment (utils.cpp:24-36). */
  def fullPath(icebergPath: String, relativeFilePath: String): String = {
    val meta = relativeFilePath.lastIndexOf("/metadata/")
    if (meta >= 0) join(icebergPath, relativeFilePath.substring(meta + 1))
    else {
      val data = relativeFilePath.lastIndexOf("/data/")
      if (data >= 0) join(icebergPath, relativeFilePath.substring(data + 1))
      else throw new java.io.IOException("Did not recognize iceberg path")
    }
  }

  def join(a: String, b: String): String =
    if (a.endsWith("/")) a + b else a + "/" + b

  /** The table directory implied by a user-supplied path: a direct
    * `.../metadata/vN.metadata.json` path points INSIDE the table, so
    * moved-path splicing must anchor at the directory two levels up —
    * otherwise every manifest resolves under the .json "directory". */
  def tableRoot(path: String): String =
    if (path.endsWith(".json")) {
      val i = path.lastIndexOf("/metadata/")
      if (i > 0) path.substring(0, i) else path
    } else path

  /** Resolve which `vN[.gz].metadata.json` to read — the reference's
    * GetMetaDataPath (iceberg.cpp:191-219). `tableVersion` is the `version`
    * scan option: "?" (default), an explicit version, or a hint-file name
    * ending in ".text" or ".txt". */
  def resolveMetadataPath(
      path: String,
      conf: Configuration,
      codec: String = "none",
      tableVersion: String = UnknownTableVersion,
      versionFormat: String = DefaultTableVersionFormat,
      allowGuessing: Boolean = false): String = {
    val metaDir = join(path, "metadata")
    val fs = new Path(path).getFileSystem(conf)
    if (path.endsWith(".json")) path
    else if (!fs.isDirectory(new Path(metaDir)))
      throw new java.io.IOException(s"""Cannot open "$path": Metadata directory does not exist""")
    else if (tableVersion.endsWith(".text") || tableVersion.endsWith(".txt")) {
      val hint = hintVersion(join(metaDir, tableVersion), conf, fs, metaDir, codec, versionFormat)
      metadataUrl(fs, metaDir, hint, codec, versionFormat)
    } else if (tableVersion != UnknownTableVersion) {
      metadataUrl(fs, metaDir, tableVersion, codec, versionFormat)
    } else if (fs.exists(new Path(join(metaDir, DefaultVersionHintFile)))) {
      val hint = hintVersion(join(metaDir, DefaultVersionHintFile), conf, fs, metaDir, codec, versionFormat)
      metadataUrl(fs, metaDir, hint, codec, versionFormat)
    } else if (!allowGuessing) {
      throw new IllegalArgumentException(
        "No version was provided and no version-hint could be found, globbing the filesystem " +
        "to locate the latest version is disabled by default as this is considered unsafe and " +
        s"could result in reading uncommitted data. To enable this use 'SET $VersionGuessingConfigKey = true;'")
    } else guessTableVersion(fs, metaDir, codec, versionFormat)
  }

  /** Read a version hint, surviving a TORN read: the writer updates the
    * hint by truncate-then-write, so a reader racing a committer can see
    * it EMPTY for a moment (the writer-side loadState has the same
    * fallback). Retry briefly, then probe the metadata directory forward
    * for the newest existing numeric version — the hint is only a cache
    * of that walk, so probing can never read anything the hint couldn't
    * have pointed at. */
  private def hintVersion(
      hintPath: String, conf: Configuration,
      fs: FileSystem, metaDir: String,
      codec: String, versionFormat: String): String = {
    var h = readString(hintPath, conf).trim
    var tries = 0
    while (h.isEmpty && tries < 5) {
      Thread.sleep(10)
      h = scala.util.Try(readString(hintPath, conf).trim).getOrElse("")
      tries += 1
    }
    if (h.nonEmpty) h
    else {
      val suffix = if (codec == "gzip") ".gz" else ""
      val fmts = versionFormat.split(',')
      var v = 1L
      while (fmts.exists(f => fs.exists(new Path(join(metaDir, f.format((v + 1).toString, suffix)))))) v += 1
      if (fmts.exists(f => fs.exists(new Path(join(metaDir, f.format(v.toString, suffix)))))) v.toString
      else throw new java.io.IOException(
        s"Empty version hint at $hintPath and no metadata versions found under $metaDir")
    }
  }

  /** GenerateMetaDataUrl (iceberg.cpp:172-188): try each comma-separated
    * format with (version, compressionSuffix); first existing wins. */
  private def metadataUrl(
      fs: FileSystem, metaDir: String, version: String,
      codec: String, versionFormat: String): String = {
    val suffix = if (codec == "gzip") ".gz" else ""
    versionFormat.split(',').foreach { fmt =>
      val url = join(metaDir, fmt.format(version, suffix))
      if (fs.exists(new Path(url))) return url
    }
    throw new java.io.IOException(
      s"Iceberg metadata file not found for table version '$version' using '$codec' compression and format(s): '$versionFormat'")
  }

  /** GuessTableVersion + PickTableVersion (iceberg.cpp:276-312):
    * glob each format with version='*', pick the lexicographic max. */
  private def guessTableVersion(
      fs: FileSystem, metaDir: String, codec: String, versionFormat: String): String = {
    val suffix = if (codec == "gzip") ".gz" else ""
    versionFormat.split(',').foreach { fmt =>
      val glob = fmt.format("*", suffix)
      val found = fs.globStatus(new Path(join(metaDir, glob)))
      if (found != null && found.nonEmpty)
        return found.map(_.getPath.toString).sorted.last
    }
    throw new java.io.IOException(
      s"Could not guess Iceberg table version using '$codec' compression and format(s): '$versionFormat'")
  }
}
