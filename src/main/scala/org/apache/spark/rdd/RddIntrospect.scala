package org.apache.spark.rdd

/** Accessor shim for `private[spark]` RDD introspection.
  *
  * `RDD.isLocallyCheckpointed` is the exact discriminator graft's bench
  * harness needs to release dead localCheckpoint blocks between queries
  * without touching deliberate CacheManager persists (table buffer pool,
  * Dedup benchMemo) — but it is package-private to org.apache.spark.rdd, so
  * this one-liner lives under that package to re-export it. No Spark
  * internals are modified or shadowed.
  */
object RddIntrospect {
  def isLocalCheckpoint(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
