package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard ahead of work-multiplying operators.
  *
  * A scan's partition count follows bytes on disk
  * (`spark.sql.files.maxPartitionBytes`), which is the right default for
  * map-only shapes but starves operators whose work grows FASTER than
  * their input: a shingle explode + self-join, a per-vector hyperplane
  * kernel, a broadcast crossJoin probe. A small parquet file plans as ONE
  * partition, and everything up to the first exchange — including the
  * probe side of a broadcast join, which never gets one — runs on one
  * core regardless of cluster size.
  *
  * `widen` repartitions up to the session's shuffle parallelism ONLY when
  * the frame is narrower than that: one cheap shuffle of the narrow frame
  * buys cores× on the expensive stage. At real scale (scans already wider
  * than `spark.sql.shuffle.partitions`) it is a no-op, so no plan ever
  * trades a working wide layout for a forced one.
  *
  * Use it SPARINGLY: the exchange + N-task orchestration costs a real
  * constant (~0.3 s at local[32]), so it only pays where the downstream
  * per-partition work is large — measured winners here are the shingle
  * self-join probe (millions of output rows per input partition) and
  * multi-regex scrubbing; measured losers are every light map kernel
  * (md5, simhash, hyperplane signatures), where 1-core streaming beats
  * 32-task scheduling at benchmark scale. A/B before adding a call site.
  */
private[graft] object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
