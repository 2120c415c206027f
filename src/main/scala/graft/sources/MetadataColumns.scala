package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Metadata columns exposed to DQL — `SELECT _file, _pos, _deleted FROM t`
  * (the reference's `MetadataColumns.java:33-51` in /root/reference:
  * FILE_PATH, ROW_POSITION, IS_DELETED).
  *
  * Semantics follow the reference's `DeleteFilter`: when `_deleted` is
  * selected, MoR-deleted rows are KEPT and marked `true` instead of being
  * filtered out — that is what makes the column useful for debugging
  * delete state. `_pos` is the row's absolute position in its data file,
  * served by the parquet reader's row-index generator (correct under
  * row-group pruning, unlike a read-side counter).
  */
object GraftMetadataColumns {
  val FilePath = "_file"
  val RowPos = "_pos"
  val IsDeleted = "_deleted"
  val Partition = "_partition"

  /** Canonical order for the scan output tail. */
  val ordered: Seq[String] = Seq(FilePath, RowPos, IsDeleted, Partition)

  /** `partType` = the table's typed partition key struct (None when
    * unpartitioned / unresolvable — then `_partition` is not exposed).
    */
  def field(name: String, partType: Option[StructType]): StructField = name match {
    case FilePath => StructField(FilePath, StringType, nullable = false)
    case RowPos => StructField(RowPos, LongType, nullable = false)
    case IsDeleted => StructField(IsDeleted, BooleanType, nullable = false)
    // nullable: a file written under an OLDER partition spec has no
    // current-spec key (the reference's PARTITION column is nullable too)
    case Partition => StructField(Partition,
      partType.getOrElse(new StructType()), nullable = true)
  }

  private def mc(n: String, c: String, partType: Option[StructType],
      nullable: Boolean = false) = new MetadataColumn {
    override def name(): String = n
    override def dataType(): DataType = field(n, partType).dataType
    override def isNullable: Boolean = nullable
    override def comment(): String = c
  }

  /** Data columns shadow metadata columns of the same name (Spark's
    * documented conflict posture) — suppress the shadowed ones.
    */
  def forSchema(schema: StructType, partType: Option[StructType]): Array[MetadataColumn] = {
    val taken = schema.fieldNames.toSet
    (Array(
      mc(FilePath, "absolute path of the data file the row lives in", None),
      mc(RowPos, "row position within the data file", None),
      mc(IsDeleted, "whether the row is marked deleted by MoR delete state", None)) ++
      partType.map(pt => mc(Partition,
        "the row's typed partition key under the current spec", Some(pt),
        nullable = true)).toArray)
      .filterNot(m => taken(m.name))
  }
}

/** A view of `row` with ordinal `skip` hidden: ordinals >= skip map to
  * +1 in the underlying row. Lets the parquet reader's appended row-index
  * column ride the physical row without perturbing the ordinals every
  * downstream expression (decode projection, MoR predicate, eq-delete
  * keys, output trim) was bound against. Mutable `row` so one instance
  * serves a whole partition.
  */
final class SkipOrdinalRow(skip: Int) extends InternalRow {
  var row: InternalRow = _
  @inline private def m(i: Int): Int = if (i >= skip) i + 1 else i
  override def numFields: Int = row.numFields - 1
  override def setNullAt(i: Int): Unit = row.setNullAt(m(i))
  override def update(i: Int, value: Any): Unit = row.update(m(i), value)
  override def copy(): InternalRow = {
    val c = new SkipOrdinalRow(skip)
    c.row = row.copy()
    c
  }
  override def isNullAt(i: Int): Boolean = row.isNullAt(m(i))
  override def getBoolean(i: Int): Boolean = row.getBoolean(m(i))
  override def getByte(i: Int): Byte = row.getByte(m(i))
  override def getShort(i: Int): Short = row.getShort(m(i))
  override def getInt(i: Int): Int = row.getInt(m(i))
  override def getLong(i: Int): Long = row.getLong(m(i))
  override def getFloat(i: Int): Float = row.getFloat(m(i))
  override def getDouble(i: Int): Double = row.getDouble(m(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    row.getDecimal(m(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = row.getUTF8String(m(i))
  override def getBinary(i: Int): Array[Byte] = row.getBinary(m(i))
  override def getInterval(i: Int): CalendarInterval = row.getInterval(m(i))
  override def getStruct(i: Int, numFields: Int): InternalRow = row.getStruct(m(i), numFields)
  override def getArray(i: Int): ArrayData = row.getArray(m(i))
  override def getMap(i: Int): MapData = row.getMap(m(i))
  override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
    row.getVariant(m(i))
  override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
    row.getGeography(m(i))
  override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
    row.getGeometry(m(i))
  override def get(i: Int, dataType: DataType): AnyRef = row.get(m(i), dataType)
}
