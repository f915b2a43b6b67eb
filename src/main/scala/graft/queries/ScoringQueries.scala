package graft.queries

object ScoringQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq()
}
