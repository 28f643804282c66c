package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExpressionSandbox

/** Compound (derived) timeseries resolution: the three member-merge
  * shapes of the reference's compound engine
  * (`inst/patches/patch_41.R:1509-1706`, `patch_53.R:1126-1239` in
  * YukonWRB/AquaCache). The member DAG itself is driver-side metadata;
  * each shape composes ONE Catalyst plan — no runtime recursion.
  */
object Compound {

  /** Fallback compound: ranked union of member series. Member with the
    * lowest priority number wins per timestamp
    * (`ROW_NUMBER() OVER (PARTITION BY datetime ORDER BY
    * member_priority, member_alias)`, `inst/patches/patch_41.R:1553-1602`).
    *
    * Extra orderCols make the pick deterministic when one member has
    * several rows per timestamp.
    *
    * Scale: one shuffle on (keyCols, dtCol) for the window — the same
    * partitioning the downstream daily aggregation reuses.
    */
  def priorityCoalesce(
      members: Seq[(DataFrame, Int, String)],
      keyCols: Seq[String],
      dtCol: String,
      orderCols: Seq[String] = Nil
  ): DataFrame = {
    val tagged = members.map { case (df, priority, alias) =>
      df.withColumn("member_priority", lit(priority))
        .withColumn("member_alias", lit(alias))
    }
    val unioned = tagged.reduce(_.unionByName(_))
    val w = Window
      .partitionBy((keyCols :+ dtCol).map(col): _*)
      .orderBy(col("member_priority") +: col("member_alias") +: orderCols.map(col): _*)
    unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "member_priority")
  }

  /** Expression compound: members equi-joined on (keyCols, dtCol),
    * then a sandbox-validated numeric expression over the member
    * aliases (`JOIN … USING (datetime)` + dynamic SQL,
    * `inst/patches/patch_41.R:1607-1704`). Inner join — a timestamp
    * must exist in every member, as in the reference.
    */
  def expressionCompound(
      members: Seq[(String, DataFrame)],
      expression: String,
      keyCols: Seq[String],
      dtCol: String,
      valueCol: String = "value",
      outCol: String = "value"
  ): DataFrame = {
    ExpressionSandbox.validate(expression, members.map(_._1).toSet) match {
      case Left(err) => throw new IllegalArgumentException(s"unsafe compound expression: $err")
      case Right(_)  =>
    }
    val joinKeys = keyCols :+ dtCol
    val aliased = members.map { case (alias, df) =>
      df.select((joinKeys.map(col) :+ col(valueCol).as(alias)): _*)
    }
    val joined = aliased.reduce(_.join(_, joinKeys, "inner"))
    joined.withColumn(outCol, expr(expression))
  }

  /** Tolerance (as-of) join: each anchor row matched to the nearest
    * member row within `toleranceSeconds`; with `mutual = true`
    * (reference `reuse_member_values = false`) the pair must be
    * mutually nearest — both ranks 1
    * (`inst/patches/patch_53.R:1126-1239`; tie-break abs(Δt) then
    * datetime then id, `:1222-1239`).
    *
    * Inputs share `keyCols`; anchor columns come out `a_`-prefixed,
    * member columns `m_`-prefixed (minus the shared keys).
    *
    * Scale: the pair join is an equi-join on keyCols with the
    * tolerance band as a post-filter — shuffle on the series key both
    * sides already share, never a cartesian. The two rank windows
    * repartition by pair ids but stay within the same series keys.
    */
  def toleranceAsOf(
      anchor: DataFrame,
      member: DataFrame,
      toleranceSeconds: Long,
      keyCols: Seq[String],
      dtCol: String,
      idCol: String,
      mutual: Boolean = true
  ): DataFrame = {
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df) { (d, c) =>
        if (keyCols.contains(c)) d else d.withColumnRenamed(c, s"$p$c")
      }
    val a = prefixed(anchor, "a_")
    val m = prefixed(member, "m_")
    val aDt = col(s"a_$dtCol")
    val mDt = col(s"m_$dtCol")
    val diffUs = abs(unix_micros(aDt) - unix_micros(mDt))
    val pairs = a
      .join(m, keyCols, "inner")
      .withColumn("diff_us", diffUs)
      .filter(col("diff_us") <= toleranceSeconds * 1000000L)
    val wAnchor = Window
      .partitionBy((keyCols :+ s"a_$idCol").map(col): _*)
      .orderBy(col("diff_us"), mDt, col(s"m_$idCol"))
    val wMember = Window
      .partitionBy((keyCols :+ s"m_$idCol").map(col): _*)
      .orderBy(col("diff_us"), aDt, col(s"a_$idCol"))
    val ranked = pairs
      .withColumn("anchor_rank", row_number().over(wAnchor))
      .withColumn("member_rank", row_number().over(wMember))
    val kept =
      if (mutual) ranked.filter(col("anchor_rank") === 1 && col("member_rank") === 1)
      else ranked.filter(col("anchor_rank") === 1)
    kept.drop("anchor_rank", "member_rank")
  }
}
