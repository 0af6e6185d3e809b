package graft.queries

/** All verifiable queries, in SURVEY.md §2 order. Sections are appended as
  * they land; `SparkEntry` derives its `queries`/`oracleSql` maps from here.
  */
object Registry {
  def all: Seq[Q] =
    CoreQueries.all ++ MergeTreeQueries.all ++ MiscQueries.all ++
      FunnelQueries.all ++ PipelineQueries.all ++ ChSqlQueries.all

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
