package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-governance operators: profiling, quality assertions, robust
  * outlier detection, and snapshot diffing — the checks a training-data
  * pipeline runs BEFORE it trusts a 100 TB corpus drop.
  *
  * 100 TB design notes:
  *  - q104 profiles four columns in ONE aggregation pass; the exact
  *    distinct counts plan as a single Expand(×4) + partial aggregate,
  *    so the scan runs once and the shuffle carries only per-column
  *    partial states. (Swap `countDistinct` for
  *    `approx_count_distinct` when exactness isn't contractual — the
  *    plan shape is identical minus the Expand.)
  *  - q105 is a Deequ-style validation suite: every check reduces to a
  *    scalar violation count, referential checks are anti joins whose
  *    dim side broadcasts, and the final result is a five-row union —
  *    nothing corpus-sized ever moves.
  *  - q106 flags per-group 2σ outliers with EXACT integer moments: the
  *    5-row stats table broadcasts back to the scan instead of a
  *    `Window.partitionBy(event_type)`, which would shuffle the whole
  *    table into 5 reducers (deliberate skew) at scale. The z-test is
  *    evaluated multiplication-only — (x·n − s)² > 4(n·ss − s²) in
  *    DECIMAL(38,0) ≡ DuckDB HUGEINT — so no sqrt/float drift anywhere.
  *  - q107 diffs two corpus snapshots by md5 digest: the full outer
  *    join shuffles (id, 16-byte digest), never document text. This is
  *    the incremental-ingest primitive — at 100 TB you diff the new
  *    drop against the previous snapshot and reprocess only
  *    added/changed documents.
  */
object GovernanceQueries extends QueryPack {

  // q104: one-pass column profiling ---------------------------------------

  /** Per-column profile (count, exact distinct, min, max) over four
    * lineitem columns. Numeric columns profile as integer cents
    * (floor(x·100) — identical IEEE doubles floor identically in both
    * engines) in ONE aggregation pass; min/max render as strings so the
    * report schema is uniform across numeric and string columns.
    *
    * The string column profiles in its OWN slim aggregate: a min/max
    * over strings carries an immutable buffer field, which forces the
    * whole aggregate — including the ×3 distinct-count Expand — out of
    * HashAggregate into SortAggregate (measured 5.7 s → 1.6 s at sf0.1
    * for this split). Both scans are column-pruned, so the extra pass
    * reads one string column, not the table. */
  def q104(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      floor(col("l_quantity") * 100).as("q"),
      floor(col("l_extendedprice") * 100).as("ep"),
      floor(col("l_discount") * 100).as("dis"))
    val nums = li.agg(
        count(col("q")).as("qn"), countDistinct(col("q")).as("qd"),
        min(col("q")).as("qmin"), max(col("q")).as("qmax"),
        count(col("ep")).as("en"), countDistinct(col("ep")).as("ed"),
        min(col("ep")).as("emin"), max(col("ep")).as("emax"),
        count(col("dis")).as("dn"), countDistinct(col("dis")).as("dd"),
        min(col("dis")).as("dmin"), max(col("dis")).as("dmax"))
      .selectExpr("""stack(3,
        'l_discount_c',      dn, dd, CAST(dmin AS STRING), CAST(dmax AS STRING),
        'l_extendedprice_c', en, ed, CAST(emin AS STRING), CAST(emax AS STRING),
        'l_quantity_c',      qn, qd, CAST(qmin AS STRING), CAST(qmax AS STRING)
      ) AS (col, n, n_distinct, min_s, max_s)""")
    val str = Tables.lineitem(s, d).select(col("l_returnflag").as("rf"))
      .agg(count(col("rf")).as("rn"), countDistinct(col("rf")).as("rd"),
        min(col("rf")).as("rmin"), max(col("rf")).as("rmax"))
      .select(lit("l_returnflag").as("col"), col("rn").as("n"),
        col("rd").as("n_distinct"), col("rmin").as("min_s"), col("rmax").as("max_s"))
    nums.union(str).orderBy(col("col"))
  }

  // q105: data-quality assertion suite ------------------------------------

  /** Five declarative checks, each reduced to a violation count:
    * two referential-integrity anti joins, a primary-key uniqueness
    * check, and two domain-range checks. */
  def q105(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val customer = Tables.customer(s, d)
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), col("v").as("violations"),
        (col("v") === 0).cast("int").as("passed"))
    val checks = Seq(
      check("lineitem_orderkey_fk",
        lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v"))),
      check("lineitem_qty_range",
        lineitem.filter(!col("l_quantity").between(1, 50)).agg(count(lit(1)).as("v"))),
      check("orders_custkey_fk",
        orders.join(customer, orders("o_custkey") === customer("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v"))),
      check("orders_pk_unique",
        orders.agg((count(col("o_orderkey")) - countDistinct(col("o_orderkey"))).as("v"))),
      check("orders_totalprice_positive",
        orders.filter(col("o_totalprice") <= 0).agg(count(lit(1)).as("v"))))
    checks.reduce(_ union _).orderBy(col("check_name"))
  }

  // q106: per-group exact-moment outlier flags ----------------------------

  /** Per-event-type 2σ outlier counts via exact integer moments.
    * |x−μ| > 2σ (population σ) is evaluated as
    * (x·n − s)² > 4·(n·ss − s²) — pure DECIMAL(38,0) products, exact and
    * order-independent, mirrored by DuckDB HUGEINT.
    *
    * MAGNITUDE CONTRACT: the squared products fit DECIMAL(38,0) only
    * while |x·n − s| < 10^19, i.e. max|cents| · group_rows ≲ 10^18 (the
    * fixture: cents < 10^5, rows < 10^9 at sf100 → 10^14, five orders
    * of margin). Past that bound non-ANSI Spark nulls the product
    * silently (row counts as non-outlier) while DuckDB HUGEINT errors;
    * deployments beyond it must enable spark.sql.ansi.enabled so
    * overflow raises instead of biasing the flag, or switch the moment
    * columns to DECIMAL(38,0)-pairs (hi/lo split). GovernanceSpec
    * pins the in-bound behavior. */
  def q106(s: SparkSession, d: String): DataFrame = {
    // One corpus scan, not two: collapse to the (event_type, cents)
    // VALUE HISTOGRAM first (map-side combined; ~21:1 at sf1, and the
    // reduction only improves with scale since the cents domain is
    // fixed), derive the exact moments from the weighted histogram, and
    // flag each distinct value once — cnt rows at a time. The former
    // shape re-scanned events and ran the flag per ROW; this one's
    // post-shuffle work is arithmetic over the histogram only.
    // histogram key kept LONG through the shuffle (long hashing beats
    // decimal); the exact-decimal arithmetic starts after the collapse
    val grp = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cl"))
      .groupBy(col("event_type"), col("cl")).agg(count(lit(1)).as("cnt"))
      .withColumn("c", expr("CAST(cl AS DECIMAL(38,0))"))
    val st = grp.groupBy(col("event_type")).agg(
      sum(col("cnt")).as("n"),
      sum(expr("CAST(c * CAST(cnt AS DECIMAL(38,0)) AS DECIMAL(38,0))")).as("s"),
      sum(expr("CAST(c * c * CAST(cnt AS DECIMAL(38,0)) AS DECIMAL(38,0))")).as("ss"))
    grp.join(broadcast(st), Seq("event_type"))
      .withColumn("out",
        expr("""CASE WHEN (c * CAST(n AS DECIMAL(38,0)) - s) * (c * CAST(n AS DECIMAL(38,0)) - s)
                        > 4 * (CAST(n AS DECIMAL(38,0)) * ss - s * s)
                THEN cnt ELSE 0L END"""))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("out")).as("n_out"))
      .orderBy(col("event_type"))
  }

  // q107: snapshot diff (dataset versioning) ------------------------------

  /** Diff snapshot A (the documents table) against a deterministically
    * derived snapshot B: docs with id % 10 = 0 removed, id % 7 = 0
    * edited (text + " v2"), id % 13 = 0 re-ingested under id + 10^7.
    * The diff itself — the reusable operator — is a full outer join on
    * (doc_id, md5 digest) emitting added/removed/changed. */
  def q107(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val a = docs.select(col("doc_id"), md5(col("text")).as("dg"))
    val bKept = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit(" v2"))))
          .otherwise(md5(col("text"))).as("dg"))
    val bNew = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), md5(col("text")).as("dg"))
    val b = bKept.union(bNew)
    a.as("a").join(b.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
      .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
        when(col("b.dg").isNull, lit("removed"))
          .when(col("a.dg").isNull, lit("added"))
          .when(col("a.dg") =!= col("b.dg"), lit("changed")).as("status"))
      .filter(col("status").isNotNull)
      .orderBy(col("doc_id"))
  }

  // q134: distribution-drift monitor (exact Kolmogorov–Smirnov) ----------

  /** Drift detection between two observation periods — the alert a
    * governance layer raises before a corrupted drop poisons training.
    * Per event_type, the exact two-sample KS statistic between the
    * first half of the month (day ≤ 15, the baseline) and the second
    * (the candidate): KS = max_v |F_a(v) − F_b(v)|, reported in basis
    * points via the cross-multiplied integer form
    * max |cumA·nB − cumB·nA| · 10000 DIV (nA·nB) — no floats anywhere,
    * so both engines agree bit-for-bit.
    *
    * Scale shape: q129's histogram discipline — groupBy (type, cents)
    * map-combines the corpus to its value histogram BEFORE any window;
    * the cumulative/max pass runs over |types|·|distinct cents| rows
    * (bounded by value quantization, not corpus size). For continuous
    * values at 100 TB, quantize first (cents already are). */
  def q134(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"),
      (dayofmonth(col("ts")) <= 15).cast("int").as("is_base"))
    val hist = e.groupBy(col("event_type"), col("cents"))
      .agg(sum(col("is_base")).as("ca"), sum(lit(1) - col("is_base")).as("cb"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_base"), max(col("nb")).as("n_cur"),
        max(abs(col("cuma") * col("nb") - col("cumb") * col("na"))).as("m"))
      .select(col("event_type"), col("n_base"), col("n_cur"),
        expr("m * 10000L DIV (n_base * n_cur)").as("ks_bp"))
      .orderBy(col("event_type"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_ks_drift"      -> q134 _,
    "q104_profile"       -> q104 _,
    "q105_assertions"    -> q105 _,
    "q106_outliers"      -> q106 _,
    "q107_snapshot_diff" -> q107 _
  )

  override val oracle: Map[String, String] = Map(
    "q134_ks_drift" -> """
      WITH e AS (SELECT event_type,
                        CAST(floor(value * 100) AS BIGINT) AS cents,
                        CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_base
                 FROM events),
      hist AS (SELECT event_type, cents,
                      SUM(is_base) AS ca, SUM(1 - is_base) AS cb
               FROM e GROUP BY event_type, cents),
      cum AS (SELECT event_type, cents, ca, cb,
                     SUM(ca) OVER (PARTITION BY event_type ORDER BY cents
                                   ROWS UNBOUNDED PRECEDING) AS cuma,
                     SUM(cb) OVER (PARTITION BY event_type ORDER BY cents
                                   ROWS UNBOUNDED PRECEDING) AS cumb,
                     SUM(ca) OVER (PARTITION BY event_type) AS na,
                     SUM(cb) OVER (PARTITION BY event_type) AS nb
              FROM hist),
      agg AS (SELECT event_type,
                     CAST(MAX(na) AS BIGINT) AS n_base,
                     CAST(MAX(nb) AS BIGINT) AS n_cur,
                     CAST(MAX(abs(cuma * nb - cumb * na)) AS BIGINT) AS m
              FROM cum GROUP BY event_type)
      SELECT event_type, n_base, n_cur,
             m * 10000 // (n_base * n_cur) AS ks_bp
      FROM agg ORDER BY event_type""",
    "q104_profile" -> """
      WITH li AS (SELECT CAST(floor(l_quantity*100) AS BIGINT) q,
                         CAST(floor(l_extendedprice*100) AS BIGINT) ep,
                         CAST(floor(l_discount*100) AS BIGINT) dis,
                         l_returnflag rf
                  FROM lineitem)
      SELECT col, n, n_distinct, min_s, max_s FROM (
        SELECT 'l_quantity_c' AS col, COUNT(q) AS n, COUNT(DISTINCT q) AS n_distinct,
               CAST(MIN(q) AS VARCHAR) AS min_s, CAST(MAX(q) AS VARCHAR) AS max_s FROM li
        UNION ALL
        SELECT 'l_extendedprice_c', COUNT(ep), COUNT(DISTINCT ep),
               CAST(MIN(ep) AS VARCHAR), CAST(MAX(ep) AS VARCHAR) FROM li
        UNION ALL
        SELECT 'l_discount_c', COUNT(dis), COUNT(DISTINCT dis),
               CAST(MIN(dis) AS VARCHAR), CAST(MAX(dis) AS VARCHAR) FROM li
        UNION ALL
        SELECT 'l_returnflag', COUNT(rf), COUNT(DISTINCT rf), MIN(rf), MAX(rf) FROM li)
      ORDER BY col""",
    "q105_assertions" -> """
      SELECT * FROM (
        SELECT 'lineitem_orderkey_fk' AS check_name, CAST(COUNT(*) AS BIGINT) AS violations,
               CAST(COUNT(*) = 0 AS INT) AS passed
        FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem_qty_range', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) = 0 AS INT)
        FROM lineitem WHERE l_quantity NOT BETWEEN 1 AND 50
        UNION ALL
        SELECT 'orders_custkey_fk', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) = 0 AS INT)
        FROM orders r WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey)
        UNION ALL
        SELECT 'orders_pk_unique',
               CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               CAST(COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey) AS INT)
        FROM orders
        UNION ALL
        SELECT 'orders_totalprice_positive', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) = 0 AS INT)
        FROM orders WHERE o_totalprice <= 0)
      ORDER BY check_name""",
    "q106_outliers" -> """
      WITH ev AS (SELECT event_type, CAST(floor(value*100) AS HUGEINT) c FROM events),
      st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) n, SUM(c) s, SUM(c*c) ss
             FROM ev GROUP BY event_type)
      SELECT ev.event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN (c*n - s)*(c*n - s) > 4*(n*ss - s*s) THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      FROM ev JOIN st USING (event_type)
      GROUP BY ev.event_type ORDER BY ev.event_type""",
    "q107_snapshot_diff" -> """
      WITH a AS (SELECT doc_id, md5(text) dg FROM documents),
      b AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2') ELSE md5(text) END dg
            FROM documents WHERE doc_id % 10 <> 0
            UNION ALL
            SELECT doc_id + 10000000, md5(text) FROM documents WHERE doc_id % 13 = 0)
      SELECT doc_id, status FROM (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN b.dg IS NULL THEN 'removed'
                    WHEN a.dg IS NULL THEN 'added'
                    WHEN a.dg <> b.dg THEN 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      WHERE status IS NOT NULL
      ORDER BY doc_id"""
  )
}
