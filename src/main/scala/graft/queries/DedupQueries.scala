package graft.queries

object DedupQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq()
}
