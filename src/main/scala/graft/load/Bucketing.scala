package graft.load

import org.apache.spark.sql.DataFrame

/** Bucketed (hash-clustered) warehouse tables — the micro-partition
  * clustering-key analog of the reference's Snowflake target, and the
  * single biggest shuffle lever at 100 TB: two tables bucketed on their
  * join key by the same bucket count are ALREADY co-partitioned on
  * disk, so joining them plans with zero Exchange — the data for the
  * fact-to-fact join that would otherwise shuffle hundreds of terabytes
  * is read pre-placed. `sortBy` additionally pre-orders each bucket so
  * the sort-merge join can skip its per-partition sort.
  *
  * The write pays one up-front clustered shuffle; every subsequent join
  * or aggregation on the bucket key is exchange-free. Bucket count is a
  * layout contract: pick it once per table family (both sides of a
  * co-located join must match) and size it so a bucket fits an
  * executor's working memory at full scale.
  *
  * Verified by BucketingSpec: the bucketed self-same join's physical
  * plan contains no Exchange; the identical join over plain parquet
  * shuffles both sides.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
