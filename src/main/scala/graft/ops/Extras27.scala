package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-25 operators: Unicode script profiling and recursive
  * directory ingestion.
  */
object Extras27 {

  def queries: Seq[Q] = Seq(
    // Unicode script profile: CJK vs Latin character counts and the
    // CJK share per document — the script-level signal that routes
    // documents to the right tokenizer before any language model runs
    // (and the reason byte-fingerprint dedup must normalize first).
    // Pure codegen'd regexp counts, map-side only.
    Q("text_script_profile",
      Some("""SELECT doc_id,
             |       CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT)
             |         AS n_cjk,
             |       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
             |       CAST(round(CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
             |            AS DOUBLE) * 1e6
             |            / nullif(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
             |              + len(regexp_extract_all(text, '[A-Za-z]')), 0)) AS BIGINT)
             |         AS cjk_share_e6,
             |       CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
             |                 > len(regexp_extract_all(text, '[A-Za-z]'))
             |            THEN 'cjk' ELSE 'latin' END AS dominant
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val cjk = size(expr("regexp_extract_all(text, '[\\u4e00-\\u9fff]', 0)"))
          .cast("long")
        val latin = size(expr("regexp_extract_all(text, '[A-Za-z]', 0)"))
          .cast("long")
        Tables.documents(s, d).select(col("doc_id"),
          cjk.as("n_cjk"), latin.as("n_latin"),
          round(cjk.cast("double") * 1e6 /
            nullif((cjk + latin).cast("long"), lit(0L))).cast("long")
            .as("cjk_share_e6"),
          when(cjk > latin, "cjk").otherwise("latin").as("dominant"))
          .orderBy("doc_id")
      }),

    // recursive directory ingestion: data laid out in nested
    // per-partition folders (the date=…/hour=… landing-zone shape
    // WITHOUT partition column names) read back in one pass via
    // recursiveFileLookup — the option that makes a messy landing zone
    // scannable without a manifest.
    Q("src_recursive",
      Some("SELECT * FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val src = Tables.customer(s, d)
        val root = s"${sys.props("java.io.tmpdir")}/graft_src_recursive_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.filter(col("c_custkey") % 2 === 0)
          .write.mode("overwrite").parquet(s"$root/feed_a/day_1")
        src.filter(col("c_custkey") % 2 === 1)
          .write.mode("overwrite").parquet(s"$root/feed_b/day_2")
        s.read.option("recursiveFileLookup", "true")
          .schema(src.schema).parquet(root)
          .orderBy("c_custkey")
      }))
}
