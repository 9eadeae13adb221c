package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The engine's primary input relation: multi-turn agent transcripts
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)` — the flattened row view the reference itself chose for a
  * log record (expr/record.go:39-71 Record env; the Snowflake log DDL,
  * exporter/snowflakeexporter/exporter_logs.go:31-51).
  *
  * Two producers:
  *
  *  1. [[fromEvents]] — a deterministic, SQL-expressible derivation from the
  *     driver-provided `events` parquet table. Every row's `text` is a
  *     formatted log line (nginx-access / JSON / CSV / key-value / syslog /
  *     PII-prose+multiline), so each parse operator has real work. Because
  *     the derivation is pure column arithmetic on `events`, the exact same
  *     relation is reproducible in DuckDB ([[oracleCte]]) — that is what
  *     makes every downstream operator oracle-checkable.
  *
  *  2. [[generate]] — a seeded large-scale generator (no wall-clock, matches
  *     FIXTURES.md: the reference's telemetry generator stamps time.Now(),
  *     receiver/telemetrygeneratorreceiver/logs_generator.go:69-83, which we
  *     replace with reproducible timestamps) with Zipf-skewed conv_ids and
  *     mega-tools, used by the bench/scaling harness and the skew tests.
  */
object Transcripts {

  final val Columns = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  // ---------------------------------------------------------------------
  // 1. Deterministic derivation from the driver's events table
  // ---------------------------------------------------------------------

  /** Spark-side derivation, MATERIALIZED once per sfDir: the derived `text`
    * expression tree is large enough to trip janino's 64KB method limit
    * (whole-stage codegen falls back to interpreted) and would otherwise be
    * re-evaluated by every query. One write makes every downstream query a
    * plain columnar scan — codegen-friendly and ~free to reuse. Content is
    * deterministic, so the cache is safe across sessions.
    */
  private val materialized = scala.collection.concurrent.TrieMap[String, String]()

  /** Cache key fingerprints the SOURCE files (names, sizes, mtimes), so a
    * regenerated events table never serves a stale derived cache.
    */
  private[graft] def sourceFingerprint(sfDir: String): String = {
    val src = java.nio.file.Paths.get(sfDir, "events.parquet")
    def fileSig(p: java.nio.file.Path): String =
      s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
        java.nio.file.Files.getLastModifiedTime(p).toMillis
    val sig =
      if (!java.nio.file.Files.exists(src)) "missing"
      else if (java.nio.file.Files.isRegularFile(src)) fileSig(src)
      else {
        val s = java.nio.file.Files.list(src)
        try s.iterator().asScala.map(fileSig).toSeq.sorted.mkString("|")
        finally s.close()
      }
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir + "|" + sig).toLong & 0xFFFFFFFFL)
  }

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val key = sourceFingerprint(sfDir)
    val path = materialized.getOrElseUpdate(key, {
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft_transcripts_$key")
      if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
        // cross-process safety: stage under a unique name, then one atomic
        // rename publishes the cache (a concurrent writer's rename losing
        // the race just discards its staging copy)
        val stage = out.resolveSibling(
          s"${out.getFileName}.stage-${java.lang.ProcessHandle.current.pid}")
        fromEventsDerived(spark, sfDir).write.mode("overwrite")
          .parquet(stage.toString)
        try java.nio.file.Files.move(stage, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.FileSystemException =>
            deleteRec(stage.toFile) // lost the race; the cache already exists
        }
      }
      out.toString
    })
    spark.read.parquet(path)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** The raw (unmaterialized) derivation. Keep in lockstep with [[oracleCte]]. */
  def fromEventsDerived(spark: SparkSession, sfDir: String): DataFrame = {
    val e = spark.read.parquet(s"$sfDir/events.parquet")

    val eid = col("event_id")
    val uid = col("user_id")

    val ip = format_string("10.%d.%d.%d", uid % 256, eid % 256, (eid * 7 + 3) % 256)
    val status = when(eid % 20 === 0, 500)
      .when(eid % 20 === 1, 503)
      .when(eid % 20 === 2 || eid % 20 === 3, 404)
      .when(eid % 20 === 4, 403)
      .when(eid % 20 === 5, 301)
      .otherwise(200)
    val method = when(eid % 5 === 2, "POST")
      .when(eid % 5 === 3, "PUT")
      .when(eid % 5 === 4, "DELETE")
      .otherwise("GET")
    val path = format_string("/api/v%d/%s/%d", eid % 3 + 1, col("event_type"), eid % 1000)
    val size = (eid * 37) % 100000
    val latency = (eid * 13) % 2000
    val level = when(status >= 500, "error").when(status >= 400, "warn").otherwise("info")
    val tl = concat(date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000"))
    val stl = date_format(col("ts"), "MMM dd HH:mm:ss")
    val pri = eid % 192
    val pid = eid % 32768
    val fin = when(eid % 3 === 0, "F").otherwise("P")

    val text = when(eid % 6 === 0,
        format_string("%s - user%d [%s] \"%s %s HTTP/1.1\" %d %d \"-\" \"agent/%d\"",
          ip, uid, tl, method, path, status, size, uid % 5))
      .when(eid % 6 === 1,
        format_string("{\"level\":\"%s\",\"status\":%d,\"path\":\"%s\",\"latency_ms\":%d,\"msg\":\"request completed\"}",
          level, status, path, latency))
      .when(eid % 6 === 2,
        format_string("%s,%s,%s,%d,%d", tl, level, col("event_type"), status, latency))
      .when(eid % 6 === 3,
        format_string("level=%s component=%s code=%d latency_ms=%d msg=ok",
          level, col("event_type"), status, latency))
      .when(eid % 6 === 4,
        format_string("<%d>%s host%d %s[%d]: %s %s completed status=%d",
          pri, stl, uid, col("event_type"), pid, method, path, status))
      .otherwise(
        format_string("%s|chunk contact user%d@example.com ssn %03d-%02d-%04d card 4111111111111111 phone 555-%03d-%04d from %s",
          fin, uid, eid % 1000, eid % 100, eid % 10000, eid % 1000, (eid * 3) % 10000, ip))

    val role = when(eid % 4 === 0, "user")
      .when(eid % 4 === 1, "assistant")
      .when(eid % 4 === 2, "tool")
      .otherwise("system")
    val tool = when(eid % 4 === 2,
        when(uid % 10 <= 4, "search")
          .when(uid % 10 <= 6, "code_exec")
          .when(uid % 10 === 7, "browser")
          .when(uid % 10 === 8, "db_query")
          .otherwise("shell"))
      .otherwise("")

    val base = e.select(
      format_string("c%d-%d", uid, eid % 13).as("conv_id"),
      role.as("role"),
      text.as("text"),
      tool.as("tool"),
      col("ts"),
      eid.as("event_id"))

    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("event_id"))
    base
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
  }

  /** DuckDB CTE producing the identical relation from the `events` view —
    * prepend to every oracle statement as `WITH t AS (<oracleCte>) ...`.
    */
  val oracleCte: String = """
    SELECT conv_id, CAST(rn - 1 AS INT) AS turn_idx, role, text, tool, ts FROM (
      SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rn FROM (
        SELECT
          printf('c%d-%d', user_id, event_id % 13) AS conv_id,
          CASE WHEN event_id % 4 = 0 THEN 'user'
               WHEN event_id % 4 = 1 THEN 'assistant'
               WHEN event_id % 4 = 2 THEN 'tool'
               ELSE 'system' END AS role,
          CASE WHEN event_id % 6 = 0 THEN
            printf('%s - user%d [%s] "%s %s HTTP/1.1" %d %d "-" "agent/%d"',
              ip, user_id, tl, method, path, status, size, user_id % 5)
          WHEN event_id % 6 = 1 THEN
            printf('{"level":"%s","status":%d,"path":"%s","latency_ms":%d,"msg":"request completed"}',
              level, status, path, latency)
          WHEN event_id % 6 = 2 THEN
            printf('%s,%s,%s,%d,%d', tl, level, event_type, status, latency)
          WHEN event_id % 6 = 3 THEN
            printf('level=%s component=%s code=%d latency_ms=%d msg=ok',
              level, event_type, status, latency)
          WHEN event_id % 6 = 4 THEN
            printf('<%d>%s host%d %s[%d]: %s %s completed status=%d',
              pri, stl, user_id, event_type, pid, method, path, status)
          ELSE
            printf('%s|chunk contact user%d@example.com ssn %03d-%02d-%04d card 4111111111111111 phone 555-%03d-%04d from %s',
              fin, user_id, event_id % 1000, event_id % 100, event_id % 10000,
              event_id % 1000, (event_id * 3) % 10000, ip)
          END AS text,
          CASE WHEN event_id % 4 = 2 THEN
            CASE WHEN user_id % 10 <= 4 THEN 'search'
                 WHEN user_id % 10 <= 6 THEN 'code_exec'
                 WHEN user_id % 10 = 7 THEN 'browser'
                 WHEN user_id % 10 = 8 THEN 'db_query'
                 ELSE 'shell' END
          ELSE '' END AS tool,
          ts, event_id
        FROM (
          SELECT *,
            printf('10.%d.%d.%d', user_id % 256, event_id % 256, (event_id * 7 + 3) % 256) AS ip,
            CASE WHEN event_id % 20 = 0 THEN 500
                 WHEN event_id % 20 = 1 THEN 503
                 WHEN event_id % 20 IN (2, 3) THEN 404
                 WHEN event_id % 20 = 4 THEN 403
                 WHEN event_id % 20 = 5 THEN 301
                 ELSE 200 END AS status,
            CASE WHEN event_id % 5 = 2 THEN 'POST'
                 WHEN event_id % 5 = 3 THEN 'PUT'
                 WHEN event_id % 5 = 4 THEN 'DELETE'
                 ELSE 'GET' END AS method,
            printf('/api/v%d/%s/%d', event_id % 3 + 1, event_type, event_id % 1000) AS path,
            (event_id * 37) % 100000 AS size,
            (event_id * 13) % 2000 AS latency,
            strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000' AS tl,
            strftime(ts, '%b %d %H:%M:%S') AS stl,
            event_id % 192 AS pri,
            event_id % 32768 AS pid,
            CASE WHEN event_id % 3 = 0 THEN 'F' ELSE 'P' END AS fin
          FROM (
            SELECT *,
              CASE WHEN st >= 500 THEN 'error' WHEN st >= 400 THEN 'warn' ELSE 'info' END AS level
            FROM (
              SELECT *,
                CASE WHEN event_id % 20 = 0 THEN 500
                     WHEN event_id % 20 = 1 THEN 503
                     WHEN event_id % 20 IN (2, 3) THEN 404
                     WHEN event_id % 20 = 4 THEN 403
                     WHEN event_id % 20 = 5 THEN 301
                     ELSE 200 END AS st
              FROM events
            )
          )
        )
      )
    )"""

  /** Wrap an operator's oracle SQL with the transcripts CTE as relation `t`. */
  def withT(sql: String): String = s"WITH t AS (${oracleCte}) ${sql}"

  /** Same, but the WITH list may contain RECURSIVE CTEs (the keyword must
    * lead the whole WITH clause; it is harmless for the non-recursive t).
    */
  def withTRecursive(sql: String): String =
    s"WITH RECURSIVE t AS (${oracleCte}) ${sql}"

  // ---------------------------------------------------------------------
  // 2. Seeded large-scale generator (bench / skew / resume fixtures)
  // ---------------------------------------------------------------------

  /** Deterministic transcripts at arbitrary scale. Distributed: the rows are
    * synthesized on executors from a `spark.range` (no driver-side loop), so
    * generating 10^7+ turns parallelizes across the cluster.
    *
    * Skew knobs (the north rule's hot conv_ids / mega-tools): conv_id is
    * Zipf-ish — turn i belongs to conversation `i % nConvs` but a `hotShare`
    * fraction of all turns is folded into the first few conversations;
    * likewise tool calls concentrate on `search`.
    */
  def generate(spark: SparkSession, nTurns: Long, nConvs: Long,
               seed: Long = 42L, hotShare: Double = 0.2,
               microsPerTurn: Long = 3000000L): DataFrame = {
    val r = spark.range(0, nTurns, 1)
    val i = col("id")
    // deterministic scramble for pseudo-randomness without rand(); bounded
    // below 2^30 so downstream products never overflow int64 under ANSI mode
    // (and no abs(Long.MinValue) edge at 10^12 rows)
    val h = pmod(xxhash64(i, lit(seed)), lit(1000000007L))
    val hotCut = lit((hotShare * 100).toLong)
    val convNum = when(h % 100 < hotCut, h % 3) // hot keys: conv 0..2
      .otherwise(h % lit(nConvs))
    val eidLike = h % 1000000

    val status = when(eidLike % 20 === 0, 500)
      .when(eidLike % 20 === 1, 503)
      .when(eidLike % 20 === 2 || eidLike % 20 === 3, 404)
      .otherwise(200)
    val level = when(status >= 500, "error").when(status >= 400, "warn").otherwise("info")
    val role = when(i % 4 === 0, "user")
      .when(i % 4 === 1, "assistant")
      .when(i % 4 === 2, "tool")
      .otherwise("system")
    val tool = when(i % 4 === 2,
        when(h % 10 <= 5, "search") // mega-tool: >half of all tool calls
          .when(h % 10 <= 7, "code_exec")
          .when(h % 10 === 8, "browser")
          .otherwise("shell"))
      .otherwise("")
    // timestamps spread across hour partitions of a fixed day range; monotone
    // in generation index within a conversation (ts derived from id).
    // 2024-01-01 epoch + configurable spacing: the knob that sets turns/hour
    // and therefore hour-partition sizes at any scale
    val ts = timestamp_micros(lit(1704067200000000L) + i * microsPerTurn)
    val ip = format_string("10.%d.%d.%d", h % 223 + 1,
      (h / 7).cast("long") % 256, (h / 11).cast("long") % 256)
    val path = format_string("/api/v%d/r/%d", h % 3 + 1, h % 1000)
    val method = when(h % 5 === 2, "POST").otherwise("GET")
    val tl = concat(date_format(ts, "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000"))

    val text = when(i % 6 === 0,
        format_string("%s - user%d [%s] \"%s %s HTTP/1.1\" %d %d \"-\" \"agent/%d\"",
          ip, convNum, tl, method, path, status, (h * 37) % 100000, h % 5))
      .when(i % 6 === 1,
        format_string("{\"level\":\"%s\",\"status\":%d,\"path\":\"%s\",\"latency_ms\":%d,\"msg\":\"request completed\"}",
          level, status, path, (h * 13) % 2000))
      .when(i % 6 === 2,
        format_string("%s,%s,ev,%d,%d", tl, level, status, (h * 13) % 2000))
      .when(i % 6 === 3,
        format_string("level=%s component=gen code=%d latency_ms=%d msg=ok",
          level, status, (h * 13) % 2000))
      .when(i % 6 === 4,
        format_string("<%d>%s host%d gen[%d]: %s %s completed status=%d",
          h % 192, date_format(ts, "MMM dd HH:mm:ss"), h % 100, h % 32768, method, path, status))
      .otherwise(
        format_string("%s|chunk contact user%d@example.com ssn %03d-%02d-%04d from %s",
          when(h % 3 === 0, "F").otherwise("P"), h % 100, h % 1000, h % 100, h % 10000, ip))

    val base = r.select(
      format_string("c%d", convNum).as("conv_id"),
      role.as("role"), text.as("text"), tool.as("tool"), ts.as("ts"), i.as("gen_id"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("gen_id"))
    base.withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
  }

  /** Write the reference-shaped partitioned layout: `year=/month=/day=/hour=`
    * (mirrors exporter/azureblobexporter/exporter.go:97-127 and the
    * rehydration path regex internal/blobconsume/helpers.go:44-86), enabling
    * Hive-style partition pruning by time range. At 10^12 turns this is the
    * unit of checkpointed resume (one manifest entry per hour partition).
    */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .repartition(col("year"), col("month"), col("day"), col("hour"))
      .write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour")
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(Columns.map(col): _*)

  // ---------------------------------------------------------------------
  // Rehydration time-range API (internal/blobconsume/helpers.go:44-92)
  // ---------------------------------------------------------------------
  /** ParseEntityPath's regex verbatim: year=/month=/day=/hour= with an
    * optional minute= segment and the signal-bearing final component.
    */
  val EntityPathPattern: String =
    """^(?:[^/]*/)?year=(\d{4})/month=(\d{2})/day=(\d{2})/hour=(\d{2})/(?:minute=(\d{2})/)?([^/].*)$"""

  val EntityFields: Seq[String] =
    Seq("year", "month", "day", "hour", "minute", "entity_name")

  /** ONE regex pass over the path → struct of all parts (null struct on
    * non-matching paths, ErrInvalidEntityPath parity). Extracting parts via
    * separate regexp_extract calls re-runs the regex per part — 8× the work
    * on the rehydration listing path.
    */
  def entityParsed(path: Column): Column =
    // OptBarrier: rehydration consumers range-filter on entity_time — a
    // field DERIVED from this struct — and filter pushdown would otherwise
    // substitute the whole regex into the predicate per referenced group
    // (measured 10 regex runs per row; see OptBarrier scaladoc)
    graft.functions.OptBarrier.of(
      graft.functions.RegexExtractStruct.of(path, EntityPathPattern, EntityFields))

  /** Path-embedded entity timestamp from the parsed struct; missing minute
    * defaults to 00.
    */
  def entityTimeFrom(g: Column): Column =
    to_timestamp(
      concat(g.getField("year"), lit("-"), g.getField("month"), lit("-"),
        g.getField("day"), lit(" "), g.getField("hour"), lit(":"),
        coalesce(g.getField("minute"), lit("00"))),
      "yyyy-MM-dd HH:mm")

  def entityTime(path: Column): Column = entityTimeFrom(entityParsed(path))

  /** Telemetry signal from the entity name (helpers.go:76-86: metric/log/
    * trace signifiers matched in that order).
    */
  def entitySignalFrom(g: Column): Column = {
    val last = g.getField("entity_name")
    when(last.contains("metrics_"), "metrics")
      .when(last.contains("logs_"), "logs")
      .when(last.contains("traces_"), "traces")
      .otherwise("")
  }

  def entitySignal(path: Column): Column = entitySignalFrom(entityParsed(path))

  /** First-class time-bounded scan over the partitioned table:
    * starting_time <= entity_time <= ending_time (IsInTimeRange is
    * INCLUSIVE on both ends, helpers.go:89-92). The predicate references
    * only partition columns, so it prunes at plan time — unselected hour
    * directories are never listed, the 100 TB rehydration path.
    */
  def timeRangeScan(spark: SparkSession, path: String,
                    startingTime: String, endingTime: String): DataFrame = {
    val et = make_timestamp(col("year"), col("month"), col("day"),
      col("hour"), lit(0), lit(0))
    spark.read.parquet(path)
      .filter(et >= lit(startingTime).cast("timestamp") &&
        et <= lit(endingTime).cast("timestamp"))
      .select(Columns.map(col): _*)
  }
}
