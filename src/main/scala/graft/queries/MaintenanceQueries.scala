package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AuditCapture, TableMaintenance, Upsert}
import graft.sources.UnitConvert
import graft.tables.TestTables

/** Oracle coverage for components that were previously spec-only:
  * unit conversion + inf_to_na, Feb-29 interpolation, the RLS upsert
  * conflict modes, and the audit capture diff (SURVEY §2.1/§2.4/
  * §2.11).
  */
object MaintenanceQueries {

  /** NWIS imperial→metric + inf scrub: non-finite values injected
    * deterministically, conversion dispatched per row, NULL rows kept
    * (inf_to_na) rather than dropped.
    */
  private def unitConvert(s: SparkSession, d: String): DataFrame = {
    val e = TestTables.events(s, d)
      .withColumn(
        "raw",
        when(col("event_id") % 97 === 0, lit(Double.PositiveInfinity))
          .when(col("event_id") % 89 === 0, lit(Double.NegativeInfinity))
          .when(col("event_id") % 83 === 0, lit(Double.NaN))
          .otherwise(col("value"))
      )
      .withColumn(
        "conv",
        when(col("user_id") % 3 === 0, "ft_to_m")
          .when(col("user_id") % 3 === 1, "cfs_to_cms")
          .otherwise("f_to_c")
      )
    e.select(
      col("event_id"),
      col("conv"),
      round(
        when(col("conv") === "ft_to_m", UnitConvert.convert("ft_to_m", col("raw")))
          .when(col("conv") === "cfs_to_cms", UnitConvert.convert("cfs_to_cms", col("raw")))
          .otherwise(UnitConvert.convert("f_to_c", col("raw"))),
        6
      ).as("metric")
    ).orderBy(col("event_id"))
  }

  private val unitConvertSql =
    s"""WITH e AS (
       |  SELECT event_id,
       |         CASE WHEN event_id % 97 = 0 THEN 'Infinity'::DOUBLE
       |              WHEN event_id % 89 = 0 THEN '-Infinity'::DOUBLE
       |              WHEN event_id % 83 = 0 THEN 'NaN'::DOUBLE
       |              ELSE value END AS raw,
       |         CASE WHEN user_id % 3 = 0 THEN 'ft_to_m'
       |              WHEN user_id % 3 = 1 THEN 'cfs_to_cms'
       |              ELSE 'f_to_c' END AS conv
       |  FROM events
       |)
       |SELECT event_id, conv,
       |       round(CASE WHEN isnan(raw) OR raw = 'Infinity'::DOUBLE OR raw = '-Infinity'::DOUBLE THEN NULL
       |             WHEN conv = 'ft_to_m' THEN raw / ${UnitConvert.FtPerM}
       |             WHEN conv = 'cfs_to_cms' THEN raw / ${UnitConvert.CfsPerCms}
       |             ELSE (raw - 32.0) * 5.0 / 9.0 END, 6) AS metric
       |FROM e
       |ORDER BY event_id""".stripMargin

  /** Feb-29 leap-day interpolation over daily order revenue: the
    * Feb 29 row becomes the mean of its Feb 28 / Mar 1 neighbors with
    * the more conservative count (`TableMaintenance.feb29Interpolate`).
    */
  private def feb29(s: SparkSession, d: String): DataFrame = {
    val daily = TestTables.orders(s, d)
      .groupBy(
        col("o_orderpriority").as("series_key"),
        to_date(col("o_orderdate")).as("date")
      )
      .agg(
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("value"),
        count(lit(1)).as("doy_count")
      )
    TableMaintenance
      .feb29Interpolate(daily, "series_key", "date", Seq("value"))
      .filter(
        (month(col("date")) === 2 && dayofmonth(col("date")) >= 26) ||
          (month(col("date")) === 3 && dayofmonth(col("date")) <= 2)
      )
      .select(
        col("series_key"),
        col("date"),
        round(col("value"), 4).as("value"),
        col("doy_count")
      )
      .orderBy(col("series_key"), col("date"))
  }

  private val feb29Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS series_key, CAST(o_orderdate AS DATE) AS date,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS value,
      |         count(*) AS doy_count
      |  FROM orders GROUP BY 1, 2
      |), interp AS (
      |  SELECT d.series_key, d.date,
      |         CASE WHEN month(d.date) = 2 AND day(d.date) = 29
      |                   AND a.doy_count IS NOT NULL AND b.doy_count IS NOT NULL
      |              THEN (a.value + b.value) / 2.0 ELSE d.value END AS value,
      |         CASE WHEN month(d.date) = 2 AND day(d.date) = 29
      |                   AND a.doy_count IS NOT NULL AND b.doy_count IS NOT NULL
      |              THEN least(a.doy_count, b.doy_count) ELSE d.doy_count END AS doy_count
      |  FROM daily d
      |  LEFT JOIN daily a ON a.series_key = d.series_key
      |    AND month(d.date) = 2 AND day(d.date) = 29
      |    AND a.date = d.date - INTERVAL 1 DAY
      |  LEFT JOIN daily b ON b.series_key = d.series_key
      |    AND month(d.date) = 2 AND day(d.date) = 29
      |    AND b.date = d.date + INTERVAL 1 DAY
      |)
      |SELECT series_key, date, round(value, 4) AS value, CAST(doy_count AS BIGINT) AS doy_count
      |FROM interp
      |WHERE (month(date) = 2 AND day(date) >= 26) OR (month(date) = 3 AND day(date) <= 2)
      |ORDER BY 1, 2""".stripMargin

  /** RLS upsert (`dbAppendTableRLS` DO UPDATE): batch with duplicate
    * keys resolved last-wins by the order column, matched keys
    * replaced, new keys appended.
    */
  private def upsert(s: SparkSession, d: String): DataFrame = {
    val target = TestTables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val upd1 = target
      .filter(col("o_orderkey") % 4 === 0)
      .select(
        col("o_orderkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 10.0).as("o_totalprice"),
        lit(1L).as("batch_seq")
      )
    // second batch row for HALF those keys — must win (last-wins)
    val upd2 = target
      .filter(col("o_orderkey") % 8 === 0)
      .select(
        col("o_orderkey"),
        lit("W").as("o_orderstatus"),
        (col("o_totalprice") + 20.0).as("o_totalprice"),
        lit(2L).as("batch_seq")
      )
    val inserts = target
      .filter(col("o_orderkey") % 1000 === 7)
      .select(
        (col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"),
        col("o_totalprice"),
        lit(1L).as("batch_seq")
      )
    val merged = Upsert(
      target,
      upd1.unionByName(upd2).unionByName(inserts),
      keys = Seq("o_orderkey"),
      mode = Upsert.DoUpdate,
      orderCol = Some("batch_seq")
    )
    merged
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
        max(col("o_orderkey")).as("max_key")
      )
      .orderBy(col("o_orderstatus"))
  }

  private val upsertSql =
    """WITH target AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |), updates AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice, 1 AS batch_seq
      |  FROM target WHERE o_orderkey % 4 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'W', o_totalprice + 20.0, 2 FROM target WHERE o_orderkey % 8 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'N', o_totalprice, 1 FROM target WHERE o_orderkey % 1000 = 7
      |), dedup AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY batch_seq DESC) AS rn
      |        FROM updates)
      |  WHERE rn = 1
      |), merged AS (
      |  SELECT t.* FROM target t LEFT JOIN dedup u ON u.o_orderkey = t.o_orderkey
      |  WHERE u.o_orderkey IS NULL
      |  UNION ALL
      |  SELECT * FROM dedup
      |)
      |SELECT o_orderstatus, count(*) AS n,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(max(o_orderkey) AS BIGINT) AS max_key
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  /** Audit capture diff between the pre- and post-upsert states:
    * per-action row counts and changed-field totals — the write path
    * whose output AuditAsOf later reconstructs from.
    */
  private def auditCapture(s: SparkSession, d: String): DataFrame = {
    val before = TestTables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val after = before
      .filter(col("o_orderkey") % 7 =!= 3) // deletes
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0).otherwise(col("o_totalprice"))
      )
      .unionByName(
        before
          .filter(col("o_orderkey") % 1000 === 7)
          .select(
            (col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            col("o_totalprice")
          )
      )
    AuditCapture
      .capture(before, after, "o_orderkey", Seq("o_orderstatus", "o_totalprice"),
        actionTs = "2024-01-01 00:00:00", tableName = "orders")
      .groupBy(col("action"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("sum_id"),
        // changed_fields is U-only (null for I/D, like the reference)
        sum(coalesce(size(col("changed_fields")), lit(0))).as("n_changed")
      )
      .orderBy(col("action"))
  }

  private val auditCaptureSql =
    """WITH before AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |), after AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      |  FROM before WHERE o_orderkey % 7 <> 3
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'N', o_totalprice FROM before WHERE o_orderkey % 1000 = 7
      |), diff AS (
      |  SELECT coalesce(b.o_orderkey, a.o_orderkey) AS id,
      |         CASE WHEN b.o_orderkey IS NULL THEN 'I'
      |              WHEN a.o_orderkey IS NULL THEN 'D'
      |              WHEN b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
      |                OR b.o_totalprice IS DISTINCT FROM a.o_totalprice THEN 'U' END AS action,
      |         -- changed_fields is U-only: I/D rows contribute zero
      |         CASE WHEN b.o_orderkey IS NOT NULL AND a.o_orderkey IS NOT NULL THEN
      |           (b.o_orderstatus IS DISTINCT FROM a.o_orderstatus)::INT
      |             + (b.o_totalprice IS DISTINCT FROM a.o_totalprice)::INT
      |         ELSE 0 END AS nch
      |  FROM before b FULL OUTER JOIN after a ON b.o_orderkey = a.o_orderkey
      |)
      |SELECT action, count(*) AS n,
      |       CAST(sum(id) AS BIGINT) AS sum_id,
      |       CAST(sum(nch) AS BIGINT) AS n_changed
      |FROM diff WHERE action IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Tail trimming: derived daily rows past each series' last real
    * measurement are dropped and QC segments clamped
    * (`trim_continuous_timeseries_tail`). Measurements are cut
    * per-series at a deterministic day so every series has a tail to
    * trim.
    */
  private def tailTrim(s: SparkSession, d: String): DataFrame = {
    val e = TestTables.events(s, d)
    val daily = e
      .groupBy(col("user_id").as("timeseries_id"), to_date(col("ts")).as("date"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val meas = e
      .filter(dayofmonth(col("ts")) <= col("user_id") % 20 + 5)
      .select(col("user_id").as("timeseries_id"), col("ts").cast("timestamp").as("datetime"))
    val segs = e
      .groupBy(col("user_id").as("timeseries_id"))
      .agg(
        min(col("ts")).cast("timestamp").as("start_dt"),
        max(col("ts")).cast("timestamp").as("end_dt")
      )
    val trimmedDaily = TableMaintenance.trimDailyTail(daily, meas)
    val trimmedSegs = TableMaintenance.trimSegmentTail(segs, meas)
    trimmedDaily
      .groupBy(col("timeseries_id"))
      .agg(count(lit(1)).as("n_daily"), max(col("date")).as("last_date"))
      .join(
        trimmedSegs.select(
          col("timeseries_id"),
          unix_micros(col("start_dt")).as("seg_start_us"),
          unix_micros(col("end_dt")).as("seg_end_us")
        ),
        Seq("timeseries_id")
      )
      .orderBy(col("timeseries_id"))
  }

  private val tailTrimSql =
    """WITH daily AS (
      |  SELECT user_id AS timeseries_id, CAST(ts AS DATE) AS date,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), meas AS (
      |  SELECT user_id AS timeseries_id, ts AS datetime
      |  FROM events WHERE day(ts) <= user_id % 20 + 5
      |), last_day AS (
      |  SELECT timeseries_id, max(CAST(datetime AS DATE)) AS last_date,
      |         max(datetime) AS last_dt
      |  FROM meas GROUP BY 1
      |), segs AS (
      |  SELECT user_id AS timeseries_id, min(ts) AS start_dt, max(ts) AS end_dt
      |  FROM events GROUP BY 1
      |)
      |SELECT d.timeseries_id,
      |       count(*) AS n_daily,
      |       max(d.date) AS last_date,
      |       CAST(epoch_us(any_value(s.start_dt)) AS BIGINT) AS seg_start_us,
      |       CAST(epoch_us(least(any_value(s.end_dt), any_value(l.last_dt))) AS BIGINT) AS seg_end_us
      |FROM daily d
      |JOIN last_day l ON l.timeseries_id = d.timeseries_id
      |JOIN segs s ON s.timeseries_id = d.timeseries_id AND s.start_dt <= l.last_dt
      |WHERE d.date <= l.last_date
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- catalog bounds maintenance (SURVEY §2.4, patch_41 triggers) --

  /** Decision-table oracle for BOTH bounds-maintenance contracts
    * (`inst/patches/patch_41.R:618-960`): a nation-derived catalog
    * covering every branch (NULL start / NULL end / wide bounds the
    * batch falls inside / compound rows the triggers skip / series the
    * batch never touches / NULL and non-NULL last_new_data), an
    * events-derived append batch, and a sparse daily table. `m_*` =
    * the insert-trigger merge ([[BoundsMaintenance.mergeInsertBounds]]:
    * null-safe LEAST/GREATEST + last_new_data stamp); `x_*` = the
    * exact two-fact-table recompute chained after it
    * ([[BoundsMaintenance.refreshBasicBounds]]).
    */
  private def boundsMaintenance(s: SparkSession, d: String): DataFrame = {
    import graft.operators.BoundsMaintenance
    val n = TestTables.nation(s, d).select(col("n_nationkey").cast("long").as("n"))
    val catalog = n.select(
      col("n").as("timeseries_id"),
      when(col("n") % 5 === 0, lit("compound")).otherwise(lit("basic")).as("timeseries_type"),
      when(col("n") % 4 === 0, lit(null).cast("timestamp"))
        .when(col("n") % 7 === 0, timestamp_seconds(lit(1672531200L))) // 2023-01-01: batch inside
        .otherwise(timestamp_seconds(lit(1704844800L) + col("n") * 3600))
        .as("start_datetime"),
      when(col("n") % 4 === 1, lit(null).cast("timestamp"))
        .when(col("n") % 7 === 0, timestamp_seconds(lit(1735689600L))) // 2025-01-01
        .otherwise(timestamp_seconds(lit(1705708800L) + col("n") * 3600))
        .as("end_datetime"),
      when(col("n") % 3 === 0, lit(null).cast("timestamp"))
        .otherwise(timestamp_seconds(lit(1704412800L)))
        .as("last_new_data")
    )
    val batch = TestTables.events(s, d).select(
      (col("user_id") % 28).cast("long").as("timeseries_id"),
      col("ts").as("datetime")
    )
    val daily = n
      .filter(col("n") % 2 === 0)
      .select(
        col("n").as("timeseries_id"),
        timestamp_seconds(lit(1685577600L) + col("n") * 86400).as("datetime")
      )
    val merged =
      BoundsMaintenance.mergeInsertBounds(catalog, batch, timestamp_seconds(lit(1717200000L)))
    val refreshed = BoundsMaintenance.refreshBasicBounds(merged, batch, daily)
    merged
      .select(
        col("timeseries_id"),
        col("timeseries_type"),
        unix_micros(col("start_datetime")).as("m_start_us"),
        unix_micros(col("end_datetime")).as("m_end_us"),
        unix_micros(col("last_new_data")).as("last_new_data_us")
      )
      .join(
        refreshed.select(
          col("timeseries_id"),
          unix_micros(col("start_datetime")).as("x_start_us"),
          unix_micros(col("end_datetime")).as("x_end_us")
        ),
        Seq("timeseries_id")
      )
      .orderBy(col("timeseries_id"))
  }

  private val boundsMaintenanceSql =
    """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS n FROM nation),
      |cat AS (
      |  SELECT n AS timeseries_id,
      |         CASE WHEN n % 5 = 0 THEN 'compound' ELSE 'basic' END AS timeseries_type,
      |         CASE WHEN n % 4 = 0 THEN NULL
      |              WHEN n % 7 = 0 THEN 1672531200000000
      |              ELSE (1704844800 + n * 3600) * 1000000 END AS start_us,
      |         CASE WHEN n % 4 = 1 THEN NULL
      |              WHEN n % 7 = 0 THEN 1735689600000000
      |              ELSE (1705708800 + n * 3600) * 1000000 END AS end_us,
      |         CASE WHEN n % 3 = 0 THEN NULL ELSE 1704412800000000 END AS lnd_us
      |  FROM n
      |), ins AS (
      |  SELECT CAST(user_id % 28 AS BIGINT) AS timeseries_id,
      |         epoch_us(MIN(ts)) AS i_s, epoch_us(MAX(ts)) AS i_e
      |  FROM events GROUP BY 1
      |), dbounds AS (
      |  SELECT n AS timeseries_id,
      |         MIN((1685577600 + n * 86400) * 1000000) AS d_s,
      |         MAX((1685577600 + n * 86400) * 1000000) AS d_e
      |  FROM n WHERE n % 2 = 0 GROUP BY 1
      |), m AS (
      |  SELECT c.timeseries_id, c.timeseries_type,
      |         CASE WHEN i.timeseries_id IS NULL OR c.timeseries_type <> 'basic' THEN c.start_us
      |              WHEN c.start_us IS NULL THEN i.i_s
      |              ELSE LEAST(c.start_us, i.i_s) END AS m_start_us,
      |         CASE WHEN i.timeseries_id IS NULL OR c.timeseries_type <> 'basic' THEN c.end_us
      |              WHEN c.end_us IS NULL THEN i.i_e
      |              ELSE GREATEST(c.end_us, i.i_e) END AS m_end_us,
      |         CASE WHEN i.timeseries_id IS NOT NULL AND c.timeseries_type = 'basic'
      |              THEN 1717200000000000 ELSE c.lnd_us END AS last_new_data_us
      |  FROM cat c LEFT JOIN ins i USING (timeseries_id)
      |), x AS (
      |  SELECT m2.timeseries_id,
      |         CASE WHEN m2.timeseries_type = 'basic'
      |              THEN COALESCE(LEAST(i.i_s, d.d_s), i.i_s, d.d_s)
      |              ELSE m2.m_start_us END AS x_start_us,
      |         CASE WHEN m2.timeseries_type = 'basic'
      |              THEN COALESCE(GREATEST(i.i_e, d.d_e), i.i_e, d.d_e)
      |              ELSE m2.m_end_us END AS x_end_us
      |  FROM m m2
      |  LEFT JOIN ins i USING (timeseries_id)
      |  LEFT JOIN dbounds d USING (timeseries_id)
      |)
      |SELECT m.timeseries_id, m.timeseries_type, m.m_start_us, m.m_end_us,
      |       m.last_new_data_us, x.x_start_us, x.x_end_us
      |FROM m JOIN x USING (timeseries_id)
      |ORDER BY timeseries_id""".stripMargin

  // ---- schema docs generator (SURVEY §2.12) -------------------------

  /** Drift-pin for the schema-reference generator
    * (`R/generateACDatabaseReference.R`): drives the REAL
    * [[graft.jobs.SchemaDocs.render]] and, per documented table, emits
    * the row count parsed out of the rendered HTML tbody alongside the
    * declared column count, NOT-NULL count, and the canonical
    * `name:type:nullability` column list. The oracle restates the
    * whole decision table, so ANY schema or renderer change must
    * consciously update this row — the "generated from code, cannot
    * drift" claim enforced by the correctness gate instead of asserted
    * in a spec. Driver-side work is 8 declared schemas — a rule
    * dictionary, never data.
    */
  private def schemaDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.jobs.SchemaDocs
    val html = SchemaDocs.render()
    val rows = SchemaDocs.tables.map { case (name, _, schema) =>
      val section = html.substring(html.indexOf(s"""<section id="$name">"""))
      val body = section.substring(section.indexOf("<tbody>"), section.indexOf("</tbody>"))
      val nHtmlRows = "<tr>".r.findAllIn(body).length.toLong
      val canonical = schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}:${if (f.nullable) "null" else "notnull"}")
        .mkString("|")
      (name, schema.fields.length.toLong, schema.fields.count(!_.nullable).toLong,
        nHtmlRows, canonical)
    }
    rows
      .toDF("table_name", "n_columns", "n_not_null", "n_html_rows", "columns")
      .orderBy(col("table_name"))
  }

  private val schemaDocsSql =
    """SELECT table_name, CAST(n_columns AS BIGINT) AS n_columns,
      |       CAST(n_not_null AS BIGINT) AS n_not_null,
      |       CAST(n_html_rows AS BIGINT) AS n_html_rows, columns
      |FROM (VALUES
      |  ('audit_log', 7, 5, 7, 'log_id:bigint:notnull|table_name:string:notnull|row_id:bigint:notnull|action:string:notnull|action_ts:timestamp:notnull|old_payload:map<string,string>:null|changed_fields:array<string>:null'),
      |  ('corrections', 10, 6, 10, 'correction_id:bigint:notnull|timeseries_id:bigint:notnull|start_dt:timestamp:notnull|end_dt:timestamp:notnull|ctype:string:notnull|value1:double:null|value2:double:null|window_seconds:bigint:null|equation:string:null|priority:int:notnull'),
      |  ('measurements_calculated_daily', 24, 2, 24, 'timeseries_id:bigint:notnull|date:date:notnull|value:double:null|imputed:boolean:null|percent_historic_range:double:null|doy_count:bigint:null|max:double:null|min:double:null|q90:double:null|q75:double:null|q50:double:null|q25:double:null|q10:double:null|mean:double:null|max_30yr:double:null|min_30yr:double:null|q90_30yr:double:null|q75_30yr:double:null|q50_30yr:double:null|q25_30yr:double:null|q10_30yr:double:null|mean_30yr:double:null|percent_historic_range_30yr:double:null|doy_count_30yr:bigint:null'),
      |  ('measurements_continuous', 9, 5, 9, 'measurement_row_id:bigint:notnull|timeseries_id:bigint:notnull|datetime:timestamp:notnull|value:double:null|period_seconds:bigint:null|imputed:boolean:notnull|no_update:boolean:notnull|created:timestamp:null|modified:timestamp:null'),
      |  ('qc_segments', 6, 5, 6, 'segment_id:bigint:null|timeseries_id:bigint:notnull|segment_type:string:notnull|value:string:notnull|start_dt:timestamp:notnull|end_dt:timestamp:notnull'),
      |  ('results', 13, 3, 13, 'result_id:bigint:notnull|sample_id:bigint:notnull|parameter_id:bigint:notnull|sample_fraction:string:null|result:double:null|result_condition:string:null|result_condition_value:double:null|result_value_type:string:null|protocol_method:string:null|laboratory:string:null|analysis_datetime:timestamp:null|share_with:array<string>:null|no_update:boolean:null'),
      |  ('samples', 14, 2, 14, 'sample_id:bigint:notnull|location_id:bigint:null|sub_location_id:bigint:null|media_id:bigint:null|z:double:null|datetime:timestamp:notnull|target_datetime:timestamp:null|collection_method:string:null|sample_type:string:null|documents:array<bigint>:null|share_with:array<string>:null|import_source:string:null|import_source_id:string:null|no_update:boolean:null'),
      |  ('timeseries', 21, 2, 21, 'timeseries_id:bigint:notnull|location_id:bigint:null|sub_location_id:bigint:null|parameter_id:bigint:null|media_id:bigint:null|aggregation_type:string:null|z:double:null|timeseries_type:string:null|source_fx:string:null|source_fx_args:map<string,string>:null|record_rate_seconds:bigint:null|start_datetime:timestamp:null|end_datetime:timestamp:null|last_new_data:timestamp:null|active:boolean:notnull|share_with:array<string>:null|default_owner:bigint:null|sensor_priority:int:null|timezone_daily_calc:int:null|sync_remote:boolean:null|publicly_visible:boolean:null')
      |) AS t(table_name, n_columns, n_not_null, n_html_rows, columns)
      |ORDER BY table_name""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_unit_convert", unitConvert, Some(unitConvertSql)),
    QueryDef("q_feb29", feb29, Some(feb29Sql)),
    QueryDef("q_upsert", upsert, Some(upsertSql)),
    QueryDef("q_audit_capture", auditCapture, Some(auditCaptureSql)),
    QueryDef("q_tail_trim", tailTrim, Some(tailTrimSql)),
    QueryDef("q_bounds_maintenance", boundsMaintenance, Some(boundsMaintenanceSql)),
    QueryDef("q_schema_docs", schemaDocs, Some(schemaDocsSql))
  )
}
