package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}

/** Task planning for the DSv2 batch and micro-batch scans: split files
  * larger than the computed max split size into byte ranges and bin-pack
  * small files with an open cost — the same sizing policy as Spark's V1
  * planning (`FilePartition.maxSplitBytes` / `getFilePartitions`) and the
  * reference's task planner (`core/src/main/java/org/apache/iceberg/util/
  * TableScanUtil.java:76-102` in /root/reference). Without this, a 4 GB
  * compacted file pins one core for its whole scan (no parallelism within
  * the file) and a million-small-file table launches a million tasks.
  *
  * Range semantics: the parquet reader assigns a row group to the range
  * containing its start offset (`ParquetPartitionReaderFactory` honors
  * `PartitionedFile` start/length), so ranges partition the file's rows
  * exactly — every row surfaces once across the splits.
  *
  * Split safety: a file carrying positional deletes is NEVER split —
  * the merge-on-read reader counts emitted rows from 0 to reconstruct
  * file positions, which only equals the file-absolute position when the
  * task reads the whole file. Equality deletes and MoR predicates match
  * on row VALUES and survive any range split.
  *
  * SPJ safety: when the scan reports `KeyGroupedPartitioning`, packing
  * never crosses key groups — each emitted partition carries one key
  * (`HasPartitionKey`), and Spark regroups same-key partitions into one
  * SPJ task (`DataSourceV2ScanExecBase.groupPartitions`).
  */
object TaskPlanner {

  /** One planned file: its read range, delete scope, optional SPJ key
    * row, and whether range-splitting is safe for it.
    */
  case class Item(pf: PartitionedFile, slice: GraftFileSlice,
      key: InternalRow, splittable: Boolean)

  /** Spark's V1 max-split policy: cap at `spark.sql.files.maxPartitionBytes`,
    * floor at the open cost, target `totalBytes / minPartitionNum` so small
    * tables still fan out over the cluster.
    */
  def maxSplitBytes(spark: SparkSession, totalBytes: Long,
      openCostOverride: Option[Long] = None): Long = {
    val conf = spark.sessionState.conf
    val minPartNum = conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val bytesPerCore = totalBytes / math.max(1, minPartNum)
    val openCost = openCostOverride.getOrElse(conf.filesOpenCostInBytes)
    // floor of 1: a zero open cost on a tiny table must not produce a
    // zero split size (division/step-by-zero in the callers)
    math.max(1L,
      math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore)))
  }

  /** `splitSize` / `openCostOpt` are the reference's per-read planning
    * knobs (SparkReadOptions.SPLIT_SIZE / FILE_OPEN_COST, table
    * properties `read.split.target-size` / `read.split.open-file-cost`,
    * TableScanUtil): an explicit split size is ABSOLUTE — it replaces the
    * adaptive Spark policy entirely, like the reference's targetSplitSize —
    * while the open cost feeds both the adaptive floor and bin-packing.
    */
  def plan(spark: SparkSession, items: Seq[Item], groupByKey: Boolean,
      splitSize: Option[Long] = None,
      openCostOpt: Option[Long] = None): Array[InputPartition] = {
    if (items.isEmpty) return Array.empty
    val openCost = openCostOpt.getOrElse(spark.sessionState.conf.filesOpenCostInBytes)
    // an explicit non-positive split size is a CONFIGURATION error — the
    // reference's TableScanUtil rejects it too; clamping to 1 byte would
    // expand a 1 GB file into ~10^9 planned ranges and hang the driver
    splitSize.foreach(s => require(s > 0,
      s"read.split.target-size / split-size must be positive, got $s"))
    val maxSplit = splitSize.getOrElse(
      maxSplitBytes(spark, items.map(_.pf.length + openCost).sum, openCostOpt))

    // 1) oversized splittable files → byte ranges
    val sized = items.flatMap { it =>
      if (it.splittable && it.pf.length > maxSplit) {
        (0L until it.pf.length by maxSplit).map { off =>
          it.copy(pf = it.pf.copy(start = off,
            length = math.min(maxSplit, it.pf.length - off)))
        }
      } else Seq(it)
    }

    // 2) bin-pack (largest first), never across SPJ key groups
    val groups: Seq[Seq[Item]] =
      if (groupByKey) sized.groupBy(_.key).values.toSeq else Seq(sized)
    val parts = ArrayBuffer.empty[Seq[Item]]
    groups.foreach { g =>
      var cur = ArrayBuffer.empty[Item]
      var size = 0L
      g.sortBy(-_.pf.length).foreach { it =>
        // the admission test excludes the candidate's OWN open cost (it
        // accrues after), so a pack can exceed the target by up to one
        // open cost — deliberate parity with Spark's getFilePartitions,
        // which accounts the same way
        if (cur.nonEmpty && size + it.pf.length > maxSplit) {
          parts += cur.toSeq; cur = ArrayBuffer.empty[Item]; size = 0L
        }
        cur += it
        size += it.pf.length + openCost
      }
      if (cur.nonEmpty) parts += cur.toSeq
    }
    parts.zipWithIndex.map { case (g, i) =>
      GraftInputPartition(FilePartition(i, g.map(_.pf).toArray),
        g.map(_.slice), g.head.key): InputPartition
    }.toArray
  }
}
