package graft.spark

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scale pattern pin: bucketed tables co-locate join keys at WRITE time, so
  * the join itself needs no exchange — the pre-shuffle that makes repeated
  * fact-fact joins affordable at 100 TB. Asserted structurally here the
  * same way `PlanAuditSpec` pins broadcasts and pushdown.
  */
class BucketingSpec extends AnyFunSuite with Matchers {

  private val spark = TestSpark.session
  import spark.implicits._

  test("a join of two tables bucketed on the join key runs without a shuffle") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graftbuckets")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val wh = Files.createTempDirectory("graft_buckets")
      val orders = (1L to 10000L).map(i => (i, s"o$i")).toDF("key", "odata")
      val items = (1L to 30000L).map(i => (i % 10000 + 1, s"i$i")).toDF("key", "idata")

      orders.write.bucketBy(8, "key").sortBy("key")
        .option("path", s"$wh/orders_b").saveAsTable("graftbuckets.orders_b")
      items.write.bucketBy(8, "key").sortBy("key")
        .option("path", s"$wh/items_b").saveAsTable("graftbuckets.items_b")

      val joined = spark.table("graftbuckets.orders_b")
        .join(spark.table("graftbuckets.items_b"), "key")
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning" // co-located by bucketing
      joined.count() shouldBe 30000
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graftbuckets.orders_b")
      spark.sql("DROP TABLE IF EXISTS graftbuckets.items_b")
    }
  }
}
