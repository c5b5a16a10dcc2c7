package graft.queries

import graft.SparkSpec

/** Families.warm: prepaying the family-cache builds means a later
  * family member runs at its steady-state (QBench "warm") cost. The
  * mechanism is memoization — after warm, every family builder returns
  * the ALREADY-BUILT frames (instance-identical, so provably zero
  * retraining) — pinned here alongside a result-equality check that
  * the warmed path computes the same answer a cold session does.
  */
class FamiliesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("warm prepays the unigram EM and WordPiece builds: later consumers get the same instances, zero retraining") {
    LangModel.clearCaches(spark)
    Families.warm(spark, dir)
    val u1 = LangModel.unigramTrainFrames(spark, dir, LangModel.UnigramRounds)
    val w1 = LangModel.wordPieceTrainFrames(spark, dir, LangModel.WordPieceRounds)
    // instance identity = the cache was hit, not retrained — this is
    // exactly why q259's post-warm run is the QBench warm number, not
    // the ~9 s (sf0.1) cold first-touch
    assert(u1._2 eq LangModel.unigramTrainFrames(spark, dir, LangModel.UnigramRounds)._2)
    assert(w1._2 eq LangModel.wordPieceTrainFrames(spark, dir, LangModel.WordPieceRounds)._2)
    // idempotent: warming again replaces nothing
    Families.warm(spark, dir)
    assert(u1._2 eq LangModel.unigramTrainFrames(spark, dir, LangModel.UnigramRounds)._2)
  }

  test("a family member after warm computes the cold session's exact answer") {
    LangModel.clearCaches(spark)
    val cold = LangModel.q259FertilityByLang(spark, dir).collect().toSeq
    LangModel.clearCaches(spark)
    Families.warm(spark, dir)
    val warm = LangModel.q259FertilityByLang(spark, dir).collect().toSeq
    assert(warm == cold)
  }

  test("warm makes q259's run cheaper than its cold first-touch (the EM run moved into warm)") {
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    LangModel.clearCaches(spark)
    val coldSec = timed(LangModel.q259FertilityByLang(spark, dir).collect())
    LangModel.clearCaches(spark)
    Families.warm(spark, dir)
    // min-of-two on the warm side (the bench discipline): the claim is
    // about steady-state cost, and cold includes the EM rounds the
    // warmed runs must not pay again
    val warmSec = Seq(
      timed(LangModel.q259FertilityByLang(spark, dir).collect()),
      timed(LangModel.q259FertilityByLang(spark, dir).collect())).min
    assert(warmSec < coldSec,
      f"post-warm q259 ($warmSec%.2f s) not cheaper than cold ($coldSec%.2f s)")
  }
}
