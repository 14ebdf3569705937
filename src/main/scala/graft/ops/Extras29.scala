package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-27 operators: time-in-state accounting and
  * corrupt-record JSON ingestion.
  */
object Extras29 {

  def queries: Seq[Q] = Seq(
    // time-in-state: total exact µs each user spent in each event-type
    // state, from the SCD-2 intervals (open intervals close at the
    // corpus high-water mark). The state-duration report that turns a
    // CDC history into utilization metrics; one reduction over the
    // interval table, the high-water mark broadcast.
    Q("scd2_time_in_state",
      Some("""WITH c AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         CASE WHEN lag(event_type) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id)
             |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |v AS (SELECT user_id, event_type, ts,
             |        sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS version
             |      FROM c),
             |g AS (SELECT user_id, version, min(event_type) AS event_type,
             |             min(ts) AS valid_from
             |      FROM v GROUP BY 1, 2),
             |iv AS (SELECT user_id, version, event_type, valid_from,
             |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             |           AS valid_to
             |       FROM g),
             |m AS (SELECT max(ts) AS mx FROM events)
             |SELECT iv.user_id, iv.event_type,
             |       CAST(sum(epoch_us(coalesce(iv.valid_to, m.mx))
             |                - epoch_us(iv.valid_from)) AS BIGINT) AS total_us,
             |       CAST(count(*) AS BIGINT) AS n_spells
             |FROM iv CROSS JOIN m
             |GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val iv = Scd.buildScd2(ev, col("user_id"), col("event_type"),
          col("ts"), col("event_id"))
        val m = ev.agg(max(col("ts")).as("mx"))
        iv.crossJoin(broadcast(m))
          .groupBy(col("key").as("user_id"), col("attr").as("event_type"))
          .agg(sum(unix_micros(coalesce(col("valid_to"), col("mx")))
            - unix_micros(col("valid_from"))).cast("long").as("total_us"),
            count(lit(1)).cast("long").as("n_spells"))
          .orderBy("user_id", "event_type")
      }),

    // corrupt-record JSON ingestion: a JSONL feed with known-bad lines
    // read in PERMISSIVE mode with a _corrupt_record column — good
    // rows parse, bad lines survive AS DATA for the dead-letter path
    // instead of killing the job. The staged feed appends 3 garbage
    // lines to the real rows; the report pins both counts.
    Q("src_json_corrupt",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_good,
             |       CAST(3 AS BIGINT) AS n_corrupt
             |FROM events""".stripMargin),
      (s, d) => {
        import java.nio.file.{Files, Paths}
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft_src_corrupt_$tag")
        // stage: good rows land distributed (no driver materialization);
        // the 3 known-bad lines land as one extra file in the same dir
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .toJSON.write.mode("overwrite").text(dir.toString)
        Files.write(dir.resolve("zz_bad.txt"),
          "{not json at all\ngarbage line ,,,\n{\"event_id\":}".getBytes("UTF-8"))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, " +
            "_corrupt_record STRING")
        // localCheckpoint (not cache): the full-row materialization is
        // still required before projecting only _corrupt_record (Spark
        // restriction), but checkpoint blocks are ContextCleaner-
        // reclaimed — a cache entry per (session, corpus dir) would
        // pin executor storage until application end
        val read = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(dir.toString).localCheckpoint()
        read.agg(
          count(when(col("_corrupt_record").isNull, 1)).cast("long").as("n_good"),
          count(col("_corrupt_record")).cast("long").as("n_corrupt"))
      }))
}
