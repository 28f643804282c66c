package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bulk upsert with the reference's `dbAppendTableRLS` conflict modes
  * (`R/dbAppendTableRLS.R:25-140` in YukonWRB/AquaCache): staged bulk
  * write with `ON CONFLICT DO NOTHING` or `DO UPDATE` on the key
  * columns — the exact semantics `synchronize_continuous` relies on
  * (`R/synchronize_continuous.R:728-744`).
  *
  * On a lake table this is `MERGE INTO target USING updates ON keys
  * WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` (Delta/Iceberg); the
  * engine-only equivalent here materializes the merged frame:
  * anti-join + union — one shuffle on the keys, which is also the
  * partitioning a bucketed target table would already have, so at
  * scale only matched partitions rewrite.
  */
object Upsert {

  sealed trait ConflictMode
  case object DoNothing extends ConflictMode
  case object DoUpdate extends ConflictMode

  /** @param orderCol when updates contain several rows per key, the
    *                 row with the highest orderCol wins (deterministic
    *                 batch semantics)
    */
  def apply(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      mode: ConflictMode,
      orderCol: Option[String] = None
  ): DataFrame = {
    val deduped0 = orderCol match {
      case Some(oc) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(oc).desc)
        updates.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case None => updates.dropDuplicates(keys)
    }
    // stage onto the target's column set (orderCol and any extras drop)
    val deduped = deduped0.select(target.columns.map(col): _*)
    mode match {
      case DoNothing =>
        target.unionByName(deduped.join(target.select(keys.map(col): _*), keys, "left_anti"))
      case DoUpdate =>
        target.join(deduped.select(keys.map(col): _*), keys, "left_anti").unionByName(deduped)
    }
  }
}
