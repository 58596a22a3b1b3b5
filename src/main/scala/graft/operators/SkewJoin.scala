package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side
  * (the classic hot-key problem at 100 TB), a plain shuffle join lands
  * the whole hot key on one reducer. Salting fans the big side across
  * `numSalts` sub-keys and replicates the small side once per salt, so
  * the hot key spreads over `numSalts` reducers. Results are identical
  * to the plain join (verified in SkewJoinSpec).
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * explicit variant works for any join shape and makes the technique
  * available where AQE can't see the skew (e.g. after a non-statistics
  * transform).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numSalts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until numSalts).map(lit): _*)))
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("_salt") === saltedSmall("_salt"))
      .drop("_salt")
  }
}
