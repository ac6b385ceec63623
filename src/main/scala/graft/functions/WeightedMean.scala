package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A1 as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §7.3): the weighted
  * GPA `sum(value*weight)/sum(weight)` with the reference's zero-denominator
  * guard (`app.py:143-144`).
  *
  * The plain-expression form (`sum(g*w)/sum(w)`) is what production queries
  * use — it partial-aggregates map-side and stays in codegen. This class
  * demonstrates the typed-UDAF extension surface with identical semantics:
  * the buffer is a merge-associative (Σvw, Σw) pair, so Spark can combine
  * partials from any partitioning — the property that makes the aggregate
  * cluster-safe.
  */
class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 > 0) b._1 / b._2 else 0.0

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
