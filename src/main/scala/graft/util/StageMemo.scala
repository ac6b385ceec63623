package graft.util

import org.apache.spark.sql.DataFrame

/** Staged-input memo shared by every staging site (Pipeline's replay
  * stagings, Tabular's corrupt-JSONL fixture): a staging that is a pure
  * function of its input frame(s) and shape parameters is built once per
  * key and reused — a driver looping the oracle gate / bench would
  * otherwise rewrite whole corpora per pass.
  *
  * ONE implementation because the key-construction invariants are subtle
  * and were previously maintained by hand in two places (review finding):
  * every SHAPE parameter of the staging must ride in `tag` (two same-key
  * calls with different shapes must not reuse each other's staging — r10
  * advice), and each staged FRAME's plan identity rides in the key as a
  * semantic hash (the stageKey names the corpus, but a same-key caller
  * staging a DIFFERENT frame — e.g. a filtered slice — must stage
  * independently — r14 advice). `stageKey = None` disables memoization for
  * callers staging ad-hoc frames. Memoized artifacts live for the JVM; the
  * staging dirs themselves ride [[TempRoots]]' exit-time cleanup.
  */
object StageMemo {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def apply[T <: AnyRef](stageKey: Option[String], tag: String,
                         staged: DataFrame*)(build: => T): T =
    stageKey match {
      case None => build
      case Some(k) =>
        val ident = staged.map(_.queryExecution.analyzed.semanticHash()).mkString(",")
        memo.computeIfAbsent(s"$tag|$ident|$k", _ => build).asInstanceOf[T]
    }
}
