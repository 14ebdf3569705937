package graft

/** Prints the coverage ledger (markdown) — query key, oracle status,
  * module — for SURVEY.md §2.4. */
object Ledger {
  def main(args: Array[String]): Unit = {
    val groups: Seq[(String, Seq[Q])] = Seq(
      "relational" -> ops.Relational.queries,
      "aggregate" -> ops.Aggregates.queries,
      "window" -> ops.Windows.queries,
      "join" -> ops.Joins.queries,
      "sql-surface" -> ops.SqlSurface.queries,
      "scale-mechanics" -> ops.Scale.queries,
      "extras" -> ops.Extras.queries,
      "extras-2" -> ops.Extras2.queries,
      "extras-3" -> ops.Extras3.queries,
      "extras-4" -> ops.Extras4.queries,
      "extras-5" -> ops.Extras5.queries,
      "extras-6" -> ops.Extras6.queries,
      "extras-7" -> ops.Extras7.queries,
      "extras-8" -> ops.Extras8.queries,
      "extras-9" -> ops.Extras9.queries,
      "extras-10" -> ops.Extras10.queries,
      "extras-11" -> ops.Extras11.queries,
      "extras-12" -> ops.Extras12.queries,
      "extras-13" -> ops.Extras13.queries,
      "extras-14" -> ops.Extras14.queries,
      "extras-15" -> ops.Extras15.queries,
      "extras-16" -> ops.Extras16.queries,
      "extras-17" -> ops.Extras17.queries,
      "extras-18" -> ops.Extras18.queries,
      "extras-19" -> ops.Extras19.queries,
      "extras-20" -> ops.Extras20.queries,
      "extras-21" -> ops.Extras21.queries,
      "extras-22" -> ops.Extras22.queries,
      "extras-23" -> ops.Extras23.queries,
      "extras-24" -> ops.Extras24.queries,
      "extras-25" -> ops.Extras25.queries,
      "extras-26" -> ops.Extras26.queries,
      "extras-27" -> ops.Extras27.queries,
      "extras-28" -> ops.Extras28.queries,
      "extras-29" -> ops.Extras29.queries,
      "extras-30" -> ops.Extras30.queries,
      "extras-31" -> ops.Extras31.queries,
      "extras-32" -> ops.Extras32.queries,
      "extras-33" -> ops.Extras33.queries,
      "extras-34" -> ops.Extras34.queries,
      "extras-35" -> ops.Extras35.queries,
      "extras-36" -> ops.Extras36.queries,
      "extras-37" -> ops.Extras37.queries,
      "extras-38" -> ops.Extras38.queries,
      "extras-39" -> ops.Extras39.queries,
      "extras-40" -> ops.Extras40.queries,
      "extras-41" -> ops.Extras41.queries,
      "extras-42" -> ops.Extras42.queries,
      "extras-43" -> ops.Extras43.queries,
      "extras-44" -> ops.Extras44.queries,
      "extras-45" -> ops.Extras45.queries,
      "extras-46" -> ops.Extras46.queries,
      "extras-47" -> ops.Extras47.queries,
      "extras-48" -> ops.Extras48.queries,
      "extras-49" -> ops.Extras49.queries,
      "extras-50" -> ops.Extras50.queries,
      "extras-51" -> ops.Extras51.queries,
      "analytics" -> ops.Analytics.queries,
      "typed/UDAF" -> ops.Typed.queries,
      "io/catalog" -> io.IoQueries.queries,
      "observability" -> io.HealthQueries.queries,
      "scalar-fns" -> functions.ExprQueries.queries,
      "scalar-fns-2" -> functions.ExprQueries2.queries,
      "text-analysis" -> text.TextQueries.queries,
      "dedup" -> text.DedupQueries.queries,
      "similarity" -> sim.SimQueries.queries,
      "similarity" -> sim.EmbIndexQueries.queries,
      "similarity" -> sim.PqIndexQueries.queries,
      "multimodal" -> multimodal.MultimodalQueries.queries,
      "pipeline" -> pipeline.PipelineQueries.queries,
      "streaming" -> streaming.StreamQueries.queries)
    println("| category | query key | check |")
    println("|---|---|---|")
    groups.foreach { case (g, qs) =>
      qs.foreach { q =>
        val check = if (q.oracle.isDefined) "DuckDB oracle (exact hash)" else "rows-only + unit tests"
        println(s"| $g | `${q.name}` | $check |")
      }
    }
    val reg = Registry.all.map(_.name).toSet
    val led = groups.flatMap(_._2).map(_.name).toSet
    require(reg == led,
      s"Ledger/Registry diverged: ${((reg diff led) ++ (led diff reg)).mkString(", ")}")
    val n = groups.map(_._2.size).sum
    val o = groups.flatMap(_._2).count(_.oracle.isDefined)
    println(s"\n${n} queries: ${o} oracle-checked, ${n - o} rows-only.")
  }
}
