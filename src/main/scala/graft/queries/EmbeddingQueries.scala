package graft.queries

object EmbeddingQueries extends QueryModule {
  override def queries: Seq[QueryDef] = Seq()
}
