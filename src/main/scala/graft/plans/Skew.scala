package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY §4.2 / the "salting for skew" row of
  * the scale checklist): when one join key carries a disproportionate
  * share of the big side's rows, a plain shuffle join lands the whole
  * hot key in one task. Salting splits each hot key into `nSalts`
  * sub-keys: the big side gets a per-row salt, the small side is
  * replicated once per salt value, and the join runs on
  * `(key, salt)` — identical results, `nSalts`-way parallelism on the
  * hot key.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins automatically at runtime; this explicit variant is
  * for the cases AQE cannot rewrite (e.g. aggregation-feeding joins
  * repartitioned by the caller, or deterministic test plans).
  */
object Skew {

  /** Inner-join `big` with `small` on `key`, salted `nSalts` ways.
    * `small` grows by ×`nSalts` (keep it the dimension side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val out = salted.join(replicated, Seq(key, "__salt"))
    out.drop("__salt")
  }
}
