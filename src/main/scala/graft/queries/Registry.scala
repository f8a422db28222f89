package graft.queries

/** All verifiable queries, one per implemented operator family
  * (SURVEY.md §2 + the LLM-data-pipeline extensions).
  */
object Registry {
  val all: Seq[Q] = RelationalQueries.all ++ AnalyticQueries.all ++
    LlmQueries.all ++ ChartQueries.all ++ PipelineQueries.all ++
    ExtensionQueries.all ++ VersioningQueries.all ++ TokenizerQueries.all ++
    CurationQueries.all ++ AuditQueries.all ++ WarehouseQueries.all ++
    SequenceQueries.all ++ StatQueries.all ++ GraphQueries.all ++
    AttributionQueries.all ++ RetrievalQueries.all ++
    DistributionQueries.all ++ ResolutionQueries.all

  def byName(name: String): Q = all.find(_.name == name).get
}
