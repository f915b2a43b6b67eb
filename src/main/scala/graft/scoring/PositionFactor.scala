package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Market-position factor (reference: app/scoring_engine/position_factor.py:7-29).
  *
  * pf = 0.6·clamp((VR − sector_avg)/50, −1, 1)
  *    + 0.4·clamp((pctl − 0.5)·2,       −1, 1),  clamped to [−1, 1].
  */
object PositionFactor {
  private def clamp1(x: Column): Column = least(lit(1.0), greatest(lit(-1.0), x))

  def compute(vr: Column, sectorAvg: Column, percentile: Column): Column =
    clamp1(lit(0.6) * clamp1((vr - sectorAvg) / lit(50.0))
         + lit(0.4) * clamp1((percentile - lit(0.5)) * lit(2.0)))
}
