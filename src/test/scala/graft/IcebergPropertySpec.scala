package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean, throws}

import graft.iceberg.{IcebergIO, IcebergSchemaParser}
import org.apache.spark.sql.types._

/** Property tests for the pure metadata functions (SURVEY §5c): the type
  * mapping table, path splicing, and version-format URL generation. */
object IcebergPropertySpec extends Properties("iceberg.pure") {

  private val knownPrimitives = Set(
    "boolean", "int", "long", "float", "double", "date",
    "time", "timestamp", "timestamptz", "string", "uuid", "binary",
    "variant", "timestamp_ns", "timestamptz_ns", "unknown")

  property("primitive names map to Spark types") =
    forAll(Gen.oneOf(knownPrimitives.toSeq)) { n =>
      IcebergSchemaParser.parsePrimitive(n) != null
    }

  property("unknown primitive names throw") =
    forAll(Gen.alphaStr.suchThat(s => !knownPrimitives.contains(s))) { s =>
      throws(classOf[IllegalArgumentException])(IcebergSchemaParser.parsePrimitive(s))
    }

  property("decimal(P,S) parses with exact precision and scale") =
    forAll(Gen.choose(1, 38), Gen.choose(0, 38)) { (p, s0) =>
      (s0 <= p) ==> {
        IcebergSchemaParser.parsePrimitive(s"decimal($p, $s0)") match {
          case d: DecimalType => d.precision == p && d.scale == s0
          case _ => false
        }
      }
    }

  property("fixed[N] maps to binary") =
    forAll(Gen.choose(1, 1 << 20)) { n =>
      IcebergSchemaParser.parsePrimitive(s"fixed[$n]") == BinaryType
    }

  private val pathSeg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("fullPath re-anchors at the /metadata/ or /data/ segment") =
    forAll(pathSeg, pathSeg, Gen.oneOf("metadata", "data"), pathSeg) {
      (root, prefix, kind, file) =>
        IcebergIO.fullPath(s"/$root", s"/$prefix/table/$kind/$file") ==
          s"/$root/$kind/$file"
    }

  // reference GetFullPath (utils.cpp:24-36): "/metadata/" takes precedence
  // over "/data/" wherever it appears, and the LAST occurrence of the
  // winning segment is the splice point
  property("fullPath prefers /metadata/ and splices at its last occurrence") = Prop(
    IcebergIO.fullPath("/t", "/a/metadata/x/data/f.parquet") == "/t/metadata/x/data/f.parquet" &&
    IcebergIO.fullPath("/t", "/a/data/x/metadata/f.avro") == "/t/metadata/f.avro" &&
    IcebergIO.fullPath("/t", "/a/metadata/x/metadata/f.avro") == "/t/metadata/f.avro" &&
    IcebergIO.fullPath("/t", "/a/data/x/data/f.parquet") == "/t/data/f.parquet")

  property("fullPath rejects unrecognized paths") =
    forAll(pathSeg, pathSeg) { (a, b) =>
      throws(classOf[java.io.IOException])(IcebergIO.fullPath("/t", s"/$a/$b"))
    }

  property("join inserts exactly one separator") =
    forAll(pathSeg, pathSeg) { (a, b) =>
      IcebergIO.join(s"/$a", b) == s"/$a/$b" &&
      IcebergIO.join(s"/$a/", b) == s"/$a/$b"
    }

  property("version format expands hint and gzip suffix like the reference") =
    forAll(Gen.choose(1, 9999)) { v =>
      val fmt = graft.iceberg.IcebergModel.DefaultTableVersionFormat.split(',')
      fmt(0).format(v.toString, "") == s"v$v.metadata.json" &&
      fmt(0).format(v.toString, ".gz") == s"v$v.gz.metadata.json" &&
      fmt(1).format(v.toString, "") == s"$v.metadata.json"
    }
}
