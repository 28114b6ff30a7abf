package graft.iceberg

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

import IcebergModel.Column
import scala.jdk.CollectionConverters._

/** Iceberg JSON schema → Spark types, the analogue of the reference's
  * Iceberg→DuckDB mapping (duckdb_iceberg `src/common/schema.cpp:11-140`).
  * Type table: SURVEY.md §1.3.
  */
object IcebergSchemaParser {

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[\s*(\d+)\s*\]""".r

  def parsePrimitive(s: String): DataType = s match {
    case "boolean"     => BooleanType
    case "int"         => IntegerType
    case "long"        => LongType
    case "float"       => FloatType
    case "double"      => DoubleType
    case "date"        => DateType
    // Iceberg `time` = micros-of-day; no stable Spark analogue → LongType
    // (documented deviation, SURVEY.md §1.3).
    case "time"        => LongType
    case "timestamp"   => TimestampNTZType
    case "timestamptz" => TimestampType
    case "string"      => StringType
    // Spark has no UUID type; reference's own Spark generator degrades
    // uuid→string too (scripts/test_data_generator/generate_base_parquet.py:31-48).
    case "uuid"        => StringType
    case "binary"      => BinaryType
    // Iceberg v3 semi-structured type → Spark's native VariantType: both
    // sides follow the Parquet VARIANT logical type (metadata + value
    // binaries, optionally shredded), so the parquet reader decodes it
    // directly — no JSON round trip on the read path.
    case "variant"     => VariantType
    // Iceberg v3 nanosecond timestamps: Spark has no nanos timestamp type
    // — surface the raw INT64 nanos (documented deviation, like `time`).
    // The session's nanosAsLong conf reads parquet TIMESTAMP(NANOS)
    // columns the same way, so declared and physical types agree.
    case "timestamp_ns" | "timestamptz_ns" => LongType
    // Iceberg v3 `unknown`: always-null placeholder (values are never
    // stored); reads materialize NULL via the missing-column fill.
    case "unknown"     => NullType
    case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
    case FixedRe(_)    => BinaryType
    case other => throw new IllegalArgumentException(s"Encountered an unsupported type in JSON schema: '$other'")
  }

  def parseType(node: JsonNode): DataType =
    if (node.isTextual) parsePrimitive(node.asText)
    else if (node.isObject) {
      node.get("type").asText match {
        case "struct" =>
          StructType(node.get("fields").elements.asScala.map { f =>
            val dt = parseType(f.get("type"))
            val required = f.has("required") && f.get("required").asBoolean
            // carry the nested field id so parquet reads resolve
            // struct-internal columns by id, like top-level ones
            // (renames inside structs stay evolution-safe) — an
            // extension over the reference's top-level-only schema map
            // (iceberg_scan.cpp:103-128)
            val md =
              if (f.has("id"))
                new MetadataBuilder().putLong("parquet.field.id", f.get("id").asLong).build()
              else Metadata.empty
            StructField(f.get("name").asText, dt, nullable = !required, metadata = md)
          }.toArray)
        case "list" =>
          val elemRequired = node.has("element-required") && node.get("element-required").asBoolean
          ArrayType(parseType(node.get("element")), containsNull = !elemRequired)
        case "map" =>
          val valRequired = node.has("value-required") && node.get("value-required").asBoolean
          MapType(parseType(node.get("key")), parseType(node.get("value")), valueContainsNull = !valRequired)
        case other =>
          throw new IllegalArgumentException(s"Invalid field found while parsing field: type '$other'")
      }
    } else throw new IllegalArgumentException("Invalid schema type node")

  /** Spec-v3 JSON single-value deserialization for the default-value
    * types this engine writes (primitives; Iceberg spec "JSON single-value
    * serialization"): numbers as numbers, date as 'YYYY-MM-DD' string,
    * decimal as numeric string. */
  def parseDefaultJson(dt: DataType, node: JsonNode): Any = {
    // numeric JSON nodes only: Jackson's asLong/asInt silently coerce
    // non-numeric text to 0, which would serve a WRONG default value —
    // refuse loudly instead (r19)
    def num[A](f: JsonNode => A): A =
      if (node.isNumber) f(node)
      else throw new IllegalArgumentException(
        s"non-numeric default-value JSON '$node' for ${dt.sql}")
    dt match {
      case BooleanType if node.isBoolean => node.asBoolean
      case BooleanType => throw new IllegalArgumentException(
        s"non-boolean default-value JSON '$node'")
      case IntegerType => num(_.asInt)
      // a TEXTUAL long default is the Iceberg `time` type (micros of
      // day — this engine's documented LongType mapping): spec JSON
      // "HH:mm:ss.ffffff"
      case LongType if node.isTextual =>
        java.time.LocalTime.parse(node.asText).toNanoOfDay / 1000L
      case LongType    => num(_.asLong)
      case FloatType   => num(_.asDouble.toFloat)
      case DoubleType  => num(_.asDouble)
      case StringType  => node.asText
      case DateType    => java.time.LocalDate.parse(node.asText)
      // spec single-value JSON: timestamptz carries an ISO offset
      // ("2017-11-16T14:31:08.000001+00:00"), timestamp does not
      case TimestampType =>
        java.time.OffsetDateTime.parse(node.asText).toInstant
      case TimestampNTZType => java.time.LocalDateTime.parse(node.asText)
      // binary / fixed: JSON string of hex digits
      case BinaryType =>
        val s = node.asText
        require(s.matches("([0-9a-fA-F]{2})*"), s"not a hex string: '$s'")
        s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      case _: DecimalType => new java.math.BigDecimal(node.asText)
      case other => throw new IllegalArgumentException(
        s"unsupported default-value type ${other.sql}")
    }
  }

  /** Top-level schema object → column list (schema.cpp:143-171). An
    * unparseable/unsupported default becomes [[IcebergModel.UnsupportedDefault]]
    * instead of failing the whole schema (r19, ADVICE r18): queries that
    * never touch the defaulted column keep working; reading or writing
    * it fails loudly with the recorded message. */
  def parseColumns(schema: JsonNode): Seq[Column] =
    schema.get("fields").elements.asScala.map { f =>
      val dt = parseType(f.get("type"))
      def dflt(key: String): Option[Any] =
        Option(f.get(key)).filterNot(_.isNull).map { n =>
          try parseDefaultJson(dt, n)
          catch {
            case e: Exception => IcebergModel.UnsupportedDefault(
              s"default '$n' is not representable as ${dt.sql}: ${e.getMessage}")
          }
        }
      Column(
        id = f.get("id").asInt,
        name = f.get("name").asText,
        dataType = dt,
        required = f.has("required") && f.get("required").asBoolean,
        initialDefault = dflt("initial-default"),
        writeDefault = dflt("write-default"))
    }.toSeq

  /** Select schema by id from the `schemas` array (schema.cpp:174-184). */
  def parseSchemaById(schemas: Seq[JsonNode], schemaId: Int): Seq[Column] =
    schemas.find(s => s.has("schema-id") && s.get("schema-id").asInt == schemaId)
      .orElse(if (schemas.size == 1) schemas.headOption else None)
      .map(parseColumns)
      .getOrElse(throw new IllegalArgumentException(s"Iceberg schema with id $schemaId not found"))

  /** Columns → Spark read schema carrying Iceberg field ids so the parquet
    * reader resolves columns by id (rename/evolution-safe), the analogue of
    * the reference's id-keyed schema map (iceberg_scan.cpp:103-128).
    * Requires spark.sql.parquet.fieldId.read.enabled=true.
    *
    * Spec-v3 `initial-default` columns additionally carry Spark's
    * EXISTS_DEFAULT field metadata: the parquet/ORC readers substitute it
    * for columns PHYSICALLY ABSENT from a data file (present columns keep
    * their stored values, including genuine nulls). That per-file
    * footer-presence rule is the spec's own default-resolution rule, and —
    * unlike any sequence-number derivation — it cannot be perturbed by
    * snapshot expiry (an expired declaring snapshot used to slide the
    * derived add-sequence forward and overwrite stored values). */
  /** The EXISTS_DEFAULT SQL rendering of one initial-default value.
    * TIMESTAMP defaults are rendered with an EXPLICIT UTC offset (r19,
    * ADVICE r18): `Literal.sql` renders a TimestampType value under the
    * session zone at SCHEMA-BUILD time while ResolveDefaultColumns
    * re-parses it under the READER's session zone — a zone change
    * between the two would shift the filled instant. An offset-carrying
    * literal parses to the same instant under every session zone. */
  private def defaultSql(name: String, dt: DataType, v: Any): String = v match {
    case IcebergModel.UnsupportedDefault(msg) =>
      // the failure is DEFERRED from metadata parse to here — metadata
      // surfaces (snapshots/history/manifests listings) keep working on
      // hostile foreign schemas; only building a READ schema for the
      // table's rows fails, with the recorded reason. Per-COLUMN read
      // deferral is not attainable on the V1 parquet path: Spark
      // resolves existence defaults over the FULL data schema, so a
      // poisoned EXISTS_DEFAULT fails every projection (verified
      // empirically, r19 ADVICE response).
      throw new UnsupportedOperationException(s"column '$name': $msg")
    case i: java.time.Instant if dt == TimestampType =>
      val odt = java.time.OffsetDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      val body = odt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
      s"TIMESTAMP '$body+00:00'"
    case _: Array[Byte] =>
      // decodable at the metadata layer (write-defaults fill fine), but
      // Spark's vectorized parquet reader cannot populate byte-array
      // existence defaults (ParquetColumnVector refuses) — fail with
      // the real reason instead of a deep reader crash
      throw new UnsupportedOperationException(
        s"column '$name': binary initial-defaults are not fillable by " +
        "Spark's vectorized parquet reader")
    case other => scala.util.Try(
      org.apache.spark.sql.catalyst.expressions.Literal.create(other, dt).sql)
      .getOrElse(throw new UnsupportedOperationException(
        s"column '$name': initial-default value '$other' is not " +
        s"expressible as a ${dt.sql} literal"))
  }

  def toStructType(cols: Seq[Column]): StructType =
    StructType(cols.map { c =>
      val b = new MetadataBuilder().putLong("parquet.field.id", c.id.toLong)
      c.initialDefault.foreach { v =>
        b.putString(
          org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .EXISTS_DEFAULT_COLUMN_METADATA_KEY,
          defaultSql(c.name, c.dataType, v))
      }
      StructField(c.name, c.dataType, nullable = !c.required, metadata = b.build())
    }.toArray)
}
