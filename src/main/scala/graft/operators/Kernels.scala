package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-layout repair for CPU-heavy per-row kernels.
  *
  * Parquet splits at row-group boundaries, so a corpus that lands in
  * one small file (every per-corpus [[graft.queries.Artifacts]] store,
  * any sub-128MB fixture) scans as ONE task — and a kernel pass over
  * it (the d×d matvec of [[Opq.rotate]] at ~590k flops/row, the
  * m·k1·k2 joint-AQ enumeration at ~131k/row, PQ encode at ~200k/row)
  * computes on one core while the rest of the host idles. That is the
  * guide-§2.5 "one unsplittable input file" case, and the remedy is
  * its: repartition immediately after the read.
  *
  * Made SCALE-ADAPTIVE rather than local-tuned: a frame already
  * carrying at least the cluster's default parallelism — any real
  * corpus at deployment scale — passes through untouched, so the
  * added exchange exists exactly where the alternative is idle
  * capacity, and the bytes it moves are the small frame itself.
  * Round-robin repartition: the kernels are per-row and order-free,
  * and Spark's sort-before-repartition keeps the row→partition
  * assignment deterministic under task retry (SPARK-23207).
  */
object Kernels {

  /** `df`, split across the session's default parallelism when its
    * physical plan would otherwise scan in fewer partitions. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
