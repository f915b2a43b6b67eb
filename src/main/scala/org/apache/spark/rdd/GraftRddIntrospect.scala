package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is `private[rdd]`; the cache-hygiene
  * emergency path needs it to avoid unpersisting blocks that are the only
  * copy of their data (a local checkpoint truncates lineage — see
  * graft.plans.CacheHygiene). This accessor lives in org.apache.spark.rdd
  * solely to cross that visibility boundary. */
object GraftRddIntrospect {
  /** True if `r` is checkpointed or has a (possibly pending) local
    * checkpoint — i.e. its persisted blocks may be unrebuildable. */
  def isAnyCheckpointed(r: RDD[_]): Boolean =
    r.isCheckpointed || r.isLocallyCheckpointed
}
