package graft.queries

object MultimodalQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq()
}
