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
}
