package graft

import org.apache.spark.sql.functions._

import graft.plans.Skew

/** Salted-join equivalence: identical results to the plain join, with
  * the hot key split across salt sub-keys.
  */
class SkewSpec extends GraftSuite {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side hits one key — the classic skew shape
    val big = spark.range(10000)
      .select((when(col("id") % 10 === 0, col("id") % 7).otherwise(0L)).as("k"),
        col("id").as("v"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "name")

    val plain = big.join(small, "k").groupBy("k", "name").count()
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .groupBy("k", "name").count()
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count())
  }
}
