package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Results cache (readme.md:405-411): identical query + unchanged data →
  * served from cache; changed data → automatic invalidation. */
class ResultsCacheSpec extends SparkSpec {

  test("identical queries hit; data changes invalidate automatically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rescache").toString
    Seq((1, 10.0), (2, 20.0)).toDF("id", "amt").write.parquet(s"$dir/t")
    def query() = spark.read.parquet(s"$dir/t")
      .groupBy(col("id")).agg(sum(col("amt")).as("s"))

    val cache = new ResultsCache(spark)
    val r1 = cache(query())
    assert(cache.misses === 1 && cache.hits === 0)
    assert(r1.collect().map(_.getDouble(1)).sum === 30.0)

    // a NEW identical frame (fresh attribute ids) is a hit — same object back
    val r2 = cache(query())
    assert(cache.hits === 1)
    assert(r2 eq r1)

    // rewrite the data: the input signature changes, so the same query text
    // recomputes instead of serving the stale result (the gap Spark's own
    // CacheManager leaves open until a manual refresh)
    Thread.sleep(5) // ensure a distinct mtime even on coarse filesystems
    Seq((1, 100.0)).toDF("id", "amt").write.mode("overwrite").parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").count() // refresh any file-index caching
    val r3 = cache(query())
    assert(cache.misses === 2)
    assert(r3.collect().map(_.getDouble(1)).sum === 100.0)

    // different query shape is its own entry
    cache(spark.read.parquet(s"$dir/t").agg(count(lit(1)).as("n")))
    assert(cache.misses === 3)
    cache.clear()
  }

  test("LRU eviction unpersists beyond maxEntries") {
    import spark.implicits._
    val cache = new ResultsCache(spark, maxEntries = 2)
    val base = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val frames = (0 until 3).map(i => cache(base.filter(col("id") > i)))
    assert(cache.misses === 3)
    // the eldest entry was evicted and unpersisted
    assert(frames.head.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(frames.last.storageLevel !== org.apache.spark.storage.StorageLevel.NONE)
    cache.clear()
  }
}
