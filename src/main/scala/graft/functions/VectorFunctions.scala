package graft.functions

/** Public alias for the native vector expressions (implementation lives in
  * org.apache.spark.sql.graft to reach the private[sql] extension API). */
object VectorFunctions {
  import org.apache.spark.sql.Column
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecDot(a, b)
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecNorm(a)
  def cosine(a: Column, b: Column, aNorm: Column, bNorm: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.cosine(a, b, aNorm, bNorm)
  def pqEncode(vec: Column, codebook: Column, m: Column): Column =
    org.apache.spark.sql.graft.PqFunctions.pqEncode(vec, codebook, m)
}
