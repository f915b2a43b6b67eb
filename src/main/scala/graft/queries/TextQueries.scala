package graft.queries

object TextQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq()
}
