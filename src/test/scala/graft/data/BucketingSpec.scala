package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val orders = (1L to 2000L).map(i => (i, i % 97, s"o$i")).toDF("key", "grp", "payload")
    val items = (1L to 6000L).map(i => (i % 2000 + 1, i * 2.0)).toDF("key", "amount")

    Bucketing.writeBucketed(orders, "b_orders", Seq("key"), 8, Seq("key"))
    Bucketing.writeBucketed(items, "b_items", Seq("key"), 8, Seq("key"))
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items", Seq("key"))
      // the whole point: co-located join, NO exchange on either side
      assert(!Bucketing.hasShuffleExchange(joined),
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 6000)

      // contrast: the same sort-merge join on raw DataFrames does shuffle
      // (sanity that the assertion can fail; merge hint because tiny inputs
      // would otherwise broadcast)
      val raw = orders.hint("merge").join(items, Seq("key"))
      assert(Bucketing.hasShuffleExchange(raw))

      // aggregation on the bucket key also runs exchange-free
      val agg = spark.table("b_orders").groupBy("key").agg(count(lit(1)))
      assert(!Bucketing.hasShuffleExchange(agg))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
