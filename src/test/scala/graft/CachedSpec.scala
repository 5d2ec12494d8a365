package graft

import org.apache.spark.storage.StorageLevel

import graft.sources.Cached

/** Contract of the shared persisted-relation memo that the dedup/text
  * families are built on: one persisted frame per (session, key), reused
  * by reference, deterministically released. */
class CachedSpec extends SparkSpec {

  test("of() memoizes per key and persists MEMORY_AND_DISK; releaseAll unpersists") {
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF("n") }

    val a1 = Cached.of(spark, "spec:a")(build())
    val a2 = Cached.of(spark, "spec:a")(build())
    val b = Cached.of(spark, "spec:b")(build())
    // same key → same DataFrame instance, built once; new key → new build
    assert(a1 eq a2)
    assert(builds == 2)
    assert(!(a1 eq b))
    assert(a1.storageLevel == StorageLevel.MEMORY_AND_DISK)

    Cached.releaseAll()
    // released: no cached blocks remain, and the memo forgets the key
    assert(a1.storageLevel == StorageLevel.NONE)
    val a3 = Cached.of(spark, "spec:a")(build())
    assert(builds == 3 && !(a3 eq a1))
    assert(a3.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Cached.releaseAll()
  }

  test("shared dedup relations come back as the same instance across queries") {
    import graft.operators.DedupOps
    val s1 = DedupOps.shingles(spark, Sf)
    val s2 = DedupOps.shingles(spark, Sf)
    assert(s1 eq s2)
    // a different data dir gets its own relation
    assert(!(DedupOps.shingles(spark, Sf) eq
      DedupOps.shingles(spark, "/root/testdata/sf0.01")))
  }
}
