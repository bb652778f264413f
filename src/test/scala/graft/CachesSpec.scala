package graft

import org.apache.spark.storage.StorageLevel
import graft.ext.{Caches, TextAnalysis}

/** The releasable-handle contract for operator-internal persists:
  * registration keeps the frame cached for the caller's action,
  * [[Caches.release]] drops exactly the registered frames. */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("persisted registers and release unpersists") {
    Caches.release() // clean slate
    val df = Seq(1, 2, 3).toDF("x")
    Caches.persisted(df)
    assert(df.storageLevel != StorageLevel.NONE)
    assert(Caches.registered >= 1)
    Caches.release()
    assert(df.storageLevel == StorageLevel.NONE)
    assert(Caches.registered == 0)
  }

  test("mooreLewis internal gram frame is registered and releasable") {
    Caches.release()
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "delta epsilon zeta delta", true),
      (3L, "alpha beta gamma delta", false),
      (4L, "eta theta iota kappa eta theta", false)
    ).toDF("doc_id", "text", "in_dom")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = TextAnalysis.mooreLewis(docs, "doc_id", "text", "in_dom")
    assert(out.count() == 4)
    assert(Caches.registered >= 1) // the gram explode registered itself
    Caches.release()
    assert(Caches.registered == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }
}
