package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join: salt the skewed (large) side, replicate the other.
  *
  * A hash join on a hot key concentrates one key's rows in one task; at
  * 100 TB a single hot customer/date can hold a 1000-executor stage hostage.
  * Salting splits every key into `salts` subkeys: the large side picks a
  * random salt per row, the small side is exploded to all salts, and the
  * join key becomes (key, salt) — hot keys now spread over `salts` tasks at
  * the cost of replicating the small side ×salts. AQE's skew-join handles
  * the common cases automatically; this is the explicit tool for when it
  * can't (e.g. aggregation-free pipelines or deliberate layout control).
  */
object Skew {

  /** Inner join `large ⋈ small` on `key`, salted `salts` ways. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, seed: Long = 42L): DataFrame = {
    val saltedLarge = large.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
