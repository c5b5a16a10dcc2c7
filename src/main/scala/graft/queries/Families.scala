package graft.queries

import org.apache.spark.sql.SparkSession

/** One-call warm-up for the session-memoized family caches.
  *
  * Several query families share one expensive trained artifact per
  * (session, dir): the unigram-LM EM run (q250/q251/q254/q259 — the
  * judge-measured cold first-touch is ~9 s at sf0.1), the WordPiece
  * merge loop (q255/q256), and the dedup family's shingle frame
  * (q40/q41/q42/q45/q126/q135/q138/q148). In a full suite the family's
  * alphabetically-first member pays the build and the rest ride it; a
  * user running a LATER member alone pays the same cost silently on
  * the first run. `warm` prepays every family build for `dir` in one
  * call, so any single family query afterwards runs at its
  * steady-state (QBench "warm") cost.
  *
  * Idempotent per (session, dir): every underlying cache is memoized,
  * so repeated calls return the already-built frames. Reclaim with
  * `Dedup.clearCaches` / `LangModel.clearCaches` / `TextOps.clearCaches`
  * plus the caller's persistent-RDD sweep (the Bench discipline).
  */
object Families {
  def warm(s: SparkSession, dir: String): Unit = {
    // eager: the train frames are localCheckpoint(true)-materialized
    // inside the builders
    LangModel.unigramTrainFrames(s, dir, LangModel.UnigramRounds)
    LangModel.wordPieceTrainFrames(s, dir, LangModel.WordPieceRounds)
    // r16 additions: the CT language-ID artifacts (q252/q253/q259),
    // the KN-4 model tables (q290/q291/q295) and the contamination
    // pair table (q278/q279) — all checkpointed eagerly in-builder
    TextOps.ctProfCached(s, dir)
    TextOps.ctDocGCached(s, dir)
    LangModel.kn4Frames(s, dir)
    TextOps.contaminationPairsCached(s, dir, Long.MaxValue)
    Timeseries.intervalOverlapPairs(s, dir)
    // lazy cache() — force it
    Dedup.warmShingles(s, dir)
  }
}
