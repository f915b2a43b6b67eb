package graft.functions

/** Public alias for the native string-similarity expressions
  * (implementation lives in org.apache.spark.sql.graft to reach the
  * private[sql] extension API). */
object TextSimilarity {
  import org.apache.spark.sql.Column

  /** Jaro-Winkler similarity in [0, 1], DuckDB/rapidfuzz semantics
    * (codegen'd native Expression — see
    * org.apache.spark.sql.graft.JaroWinkler). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.TextSimilarityFunctions.jaroWinkler(a, b)

  /** |A ∩ B| of two SORTED, duplicate-free array<string> columns — equals
    * size(array_intersect(a, b)) under those preconditions, via an
    * allocation-free linear merge (codegen'd native Expression — see
    * org.apache.spark.sql.graft.SortedIntersectCount). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SetFunctions.sortedIntersectCount(a, b)
}
