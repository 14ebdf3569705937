package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-10 operators: bloom-prefiltered exact decontamination,
  * existence-mark join, and the JSON sink roundtrip.
  */
object Extras13 {

  def queries: Seq[Q] = Seq(
    // EXACT fingerprint decontamination with a bloom pre-filter: train
    // docs whose normalized-text md5 appears in the eval set (doc_id %
    // 10 == 0) are removed. The bloom filter over eval fingerprints is
    // built DISTRIBUTEDLY by Spark's own BloomFilterAggregate (map-side
    // partials over XXH64-hashed keys, surfaced as `bloom_agg`); the
    // ~KB sketch is collected once and inlined as a LITERAL into the
    // codegen'd `bloom_might_contain` predicate (the same
    // constant-bloom contract Spark's InjectRuntimeFilter uses — and
    // the whole train-scan probe stays inside whole-stage codegen,
    // where the former might-contain UDF broke the span and boxed a
    // string per row). The probe splits the scan map-side:
    // definite-misses pass straight through (the common case — no
    // shuffle for them at ANY corpus size), possible-hits go through
    // the exact anti join. False positives only enlarge the verified
    // slice, so the result is bit-identical to the plain anti join the
    // oracle runs — the bloom is pure shuffle avoidance, the 100 TB
    // pattern for "new data vs reference corpus" checks.
    Q("dedup_bloom_prefilter",
      Some("""WITH ev AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
             |           FROM documents WHERE doc_id % 10 = 0)
             |SELECT doc_id FROM documents
             |WHERE doc_id % 10 <> 0
             |  AND md5(lower(trim(text))) NOT IN (SELECT fp FROM ev)
             |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        graft.plans.GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
          .withColumn("fp", md5(lower(trim(col("text")))))
        val eval = docs.filter(col("doc_id") % 10 === 0).select("fp").distinct()
        // capacity sized from the ACTUAL eval cardinality (one cheap
        // count — the sketch collect right after is a driver action
        // anyway): a hardcoded n saturates when the eval set outgrows
        // it (10% of the corpus scales; at 5x the capacity the fpp is
        // ~85% and nearly every train row pays the exact anti join the
        // prefilter exists to avoid). bits = ceil(-n ln p / ln²2) at
        // fpp=0.03 ≈ 7.3 bits/item.
        val nEval = math.max(1L, eval.count())
        val nBits = math.ceil(
          -nEval * math.log(0.03) / (math.log(2) * math.log(2))).toLong
        val bfBytes = eval.agg(call_function("bloom_agg", col("fp"),
            lit(nEval), lit(nBits)).as("bf"))
          .head().getAs[Array[Byte]](0)
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        if (bfBytes == null) {
          // BloomFilterAggregate yields NULL for an EMPTY eval set
          // (verified against the 4.1.2 jar); an empty reference
          // corpus means nothing can be contaminated — pass the train
          // set straight through rather than probing a null sketch
          // (which would fail analysis / null out both branches)
          train.select("doc_id").orderBy("doc_id")
        } else {
          val probed = train.withColumn("hit",
            call_function("bloom_might_contain", lit(bfBytes), col("fp")))
          val misses = probed.filter(!col("hit")).select("doc_id", "fp")
          val verified = probed.filter(col("hit")).select("doc_id", "fp")
            .join(eval, Seq("fp"), "left_anti")
          misses.select("doc_id").union(verified.select("doc_id"))
            .orderBy("doc_id")
        }
      }),

    // existence-mark join: every customer row annotated with a boolean
    // "has an urgent order" — the ExistenceJoin plan shape (a semi
    // join that KEEPS non-matches as false instead of dropping them).
    // The probe side reduces to distinct keys before the join, so the
    // mark costs one key-shuffle of the reduced set, not of the fact.
    Q("join_existence_mark",
      Some("""SELECT c.c_custkey,
             |       EXISTS(SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderpriority = '1-URGENT') AS has_urgent
             |FROM customer c ORDER BY c.c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""SELECT c.c_custkey,
                |       EXISTS(SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_orderpriority = '1-URGENT') AS has_urgent
                |FROM customer c ORDER BY c.c_custkey""".stripMargin)
      }),

    // JSON sink roundtrip: partitioned JSON-lines write (the
    // interchange sink every downstream consumer can read), schema-
    // pinned read-back — doubles survive because the writer emits
    // round-trippable representations.
    Q("sink_json",
      Some("SELECT * FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val src = Tables.customer(s, d)
        val out = s"${sys.props("java.io.tmpdir")}/graft_sink_json_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.write.mode("overwrite").json(out)
        s.read.schema(src.schema).json(out).orderBy("c_custkey")
      }))
}
