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

  test("q259 after warm consumes the warmed caches verbatim (the EM run moved into warm)") {
    // The non-flaky statement of "warm makes q259 cheaper": a wall-clock
    // comparison at sf0.001 loses to a single GC pause on a contended
    // machine, but the MECHANISM is exactly testable — after warm, the
    // query's run must leave every family cache instance untouched
    // (it consumed the prepaid frames; it did not retrain). The cost
    // claim itself is the QBench two-point artifact's job (QBENCH_rN
    // cold vs warm columns), measured where a measurement belongs.
    LangModel.clearCaches(spark)
    Families.warm(spark, dir)
    val uBefore = LangModel.unigramTrainFrames(spark, dir, LangModel.UnigramRounds)._2
    LangModel.q259FertilityByLang(spark, dir).collect()
    assert(uBefore eq LangModel.unigramTrainFrames(spark, dir, LangModel.UnigramRounds)._2,
      "q259 rebuilt the unigram training frames after warm — the EM run did not move into warm")
  }
}
