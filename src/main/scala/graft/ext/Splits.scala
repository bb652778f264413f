package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is by CONTENT HASH, not RNG: `randomSplit`/`sampleBy`
  * reseed per partition, so the same document flips splits whenever the
  * file layout, parallelism or Spark version changes — poison for
  * train/test hygiene. A hash of a stable id is reproducible on any
  * cluster, any layout, forever (same property as q24's stratified
  * sampler).
  *
  * Mechanics: the first two hex chars of md5(id) form 256 uniform
  * buckets; fixed-length lowercase hex compares lexicographically in
  * numeric order, so split thresholds are plain string comparisons any
  * engine evaluates identically.
  */
object Splits {

  /** 'train' | 'val' | 'test' from a stable id column. Defaults:
    * buckets < 0xe6 (230/256 ≈ 89.8%) train, < 0xf3 (243/256 ≈ +5.1%)
    * val, rest test. */
  def assignSplit(
      id: Column,
      trainHexHi: String = "e6", valHexHi: String = "f3"): Column = {
    val b = substring(md5(id.cast("string")), 1, 2)
    when(b < trainHexHi, "train")
      .when(b < valHexHi, "val")
      .otherwise("test")
  }
}
