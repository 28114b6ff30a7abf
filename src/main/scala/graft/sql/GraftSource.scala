package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.IcebergScan

import java.util
import scala.jdk.CollectionConverters._

/** `spark.read.format("graft").load(path)` — the DataFrame-reader
  * one-liner over an Iceberg table, registered via
  * META-INF/services (DataSourceRegister). The same [[GraftTable]]
  * backs it as the catalog plugin, so the extension rule splices the
  * native scan (pushdown + pruning + MoR) and the V1 bridge covers
  * extension-less sessions.
  *
  * Options (mirroring the TVF's named arguments):
  *   snapshot-id, as-of-timestamp (epoch millis), ref (branch/tag),
  *   allow-moved-paths, metadata-compression-codec, version,
  *   version-name-format
  *
  * `df.write.format("graft").mode("append"|"overwrite").save(path)`
  * appends / MoR-overwrites an EXISTING table through the same
  * `V1Write` path as `INSERT INTO`; table CREATION stays with
  * `IcebergWriter.write` or `CREATE TABLE` on the catalog (a bare
  * format write carries no partition spec to create from).
  */
class GraftSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def parse(map: CaseInsensitiveStringMap): (String, IcebergScan.Options) = {
    val path = Option(map.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\"): a table path is required — .load(path)"))
    var o = IcebergScan.Options()
    Option(map.get("snapshot-id")).foreach(v => o = o.copy(snapshotId = Some(v.toLong)))
    Option(map.get("as-of-timestamp")).foreach(v =>
      o = o.copy(asOfTimestampMs = Some(v.toLong)))
    Option(map.get("ref")).foreach(v => o = o.copy(snapshotFromRef = Some(v)))
    Option(map.get("allow-moved-paths")).foreach(v =>
      o = o.copy(allowMovedPaths = v.toBoolean))
    Option(map.get("metadata-compression-codec")).foreach(v =>
      o = o.copy(metadataCompressionCodec = v))
    Option(map.get("version")).foreach(v => o = o.copy(version = v))
    Option(map.get("version-name-format")).foreach(v =>
      o = o.copy(versionNameFormat = v))
    (path, o)
  }

  // Spark calls inferSchema then getTable with the same options on one
  // provider instance — memoize so the metadata load (snapshot
  // selection + schema parse, remote I/O on object stores) runs once
  @volatile private var last: Option[(Map[String, String], GraftTable)] = None

  private def resolve(map: CaseInsensitiveStringMap): GraftTable = {
    val key = map.asCaseSensitiveMap().asScala.toMap
    last match {
      case Some((k, t)) if k == key => t
      case _ =>
        val t = Option(map.get("table")) match {
          // `option("table", "catalog.ns.t")` (round 12): resolve through
          // the session's catalog plugin so the returned table CARRIES
          // its catalog write context (REST commits go through
          // commitThrough, not past the pointer) — the sink-side twin of
          // the stream source's identifier option
          case Some(ident) =>
            require(map.get("path") == null,
              "format(\"graft\"): pass exactly one of 'path' or 'table'")
            val raw = ident.split("\\.").filter(_.nonEmpty)
            // 2-part identifiers resolve against the session's current
            // catalog — same promotion as the stream source's option
            val parts =
              if (raw.length == 2)
                SparkSession.active.catalog.currentCatalog() +: raw
              else raw
            require(parts.length >= 3,
              s"option 'table' must be 'catalog.namespace.name' (or " +
                s"'namespace.name' under the current catalog), got '$ident'")
            org.apache.spark.sql.graftshim.GraftShims
              .catalogPlugin(SparkSession.active, parts.head) match {
              case tc: org.apache.spark.sql.connector.catalog.TableCatalog =>
                tc.loadTable(Identifier.of(parts.tail.init, parts.last)) match {
                  case g: GraftTable => g
                  case other => throw new IllegalArgumentException(
                    s"'$ident' is not a graft table (${other.getClass.getName})")
                }
              case other => throw new IllegalArgumentException(
                s"'${parts.head}' is not a table catalog (${other.getClass.getName})")
            }
          case None =>
            val (path, o) = parse(map)
            GraftTable.resolve(SparkSession.active, "graft",
              Identifier.of(Array.empty, path), path, o)
        }
        last = Some((key, t))
        t
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}
