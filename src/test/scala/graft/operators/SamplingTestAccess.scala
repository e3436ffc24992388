package graft.operators

import org.apache.spark.sql.Column

/** Test-only bridge into package-private sampling internals. */
object SamplingTestAccess {
  def knuthHash(c: Column): Column = Sampling.knuthHash(c)
  def mixLong(key: Long): Long = Multimodal.mixLong(key)
}
