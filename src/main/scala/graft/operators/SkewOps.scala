package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * [[saltedJoin]] spreads a hot join key over `buckets` sub-partitions:
  * the left (skewed) side salts each row deterministically from a
  * discriminator column; the right side replicates each row once per
  * salt value. The join then runs on (key, salt), so a key that used to
  * land on one reducer fans out over `buckets` reducers. Semantically
  * identical to the plain join (verified by oracle q29 and spec).
  *
  * AQE's skew-join split handles moderate skew automatically; explicit
  * salting is the tool for the pathological single-key hot spot (the
  * "null key" / "default tenant" problem) where one key exceeds a
  * single executor's memory. Cost: |R|·buckets replication — use with a
  * right side small enough to replicate but too big to broadcast.
  */
object SkewOps {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: Column, buckets: Int): DataFrame = {
    require(buckets > 0)
    val l = left.withColumn("__salt",
      pmod(hash(discriminator), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
