package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity resolution — the record-linkage half of deduplication: find
  * records that refer to the same real-world entity despite small string
  * differences (typos, OCR digits). The classic shape is blocking (cheap
  * key → candidate pairs) + verification (expensive string distance on
  * candidates only); a naive implementation is an all-pairs self-join.
  *
  * The blocking here is the position-wildcard (deletion-neighborhood /
  * SymSpell-style, public technique) signature join, specialized to
  * same-length inputs: each name emits L signatures, signature i = the
  * name with position i replaced by a sentinel. Two equal-length names
  * at edit distance <= 1 are either equal or differ by exactly one
  * substitution at some position p — and then they share EXACTLY the
  * signature p (at any other wildcard position they still differ at p).
  * So the signature equijoin is a provably COMPLETE candidate generator
  * for same-length distance <= 1 (the q42 SimHash pigeonhole argument,
  * taken to its exact limit), and a levenshtein verify keeps the
  * declared semantics independent of the blocking proof.
  *
  * At 100 TB: explode is map-side (L signatures per record, L = name
  * length), candidates come from ONE signature-keyed shuffle, and block
  * sizes stay tiny because a block is "records agreeing everywhere but
  * one position" — the stringent agreement real ER blocking aims for.
  * No all-pairs computation exists at any step; the oracle twin is the
  * quadratic self-join this operator exists to avoid.
  */
object Entity {

  /** The unordered q108 pair set — the blocking join WITHOUT the
    * presentation sort. Split out because `orderBy` range-partitioning
    * SAMPLES its child, i.e. executes the whole blocking join a second
    * time just to pick split points: consumers that feed the pairs into
    * further computation (q218's components, q164b's verify) must not
    * pay that, only the registered q108 presentation does.
    */
  /** The wildcard-signature frame shared by the pair join (q108) and
    * the star-edge generator (q218): signature i = name with position i
    * wildcarded; length rides along so cross-length signature collisions
    * (impossible here, cheap anyway) never reach the verify.
    */
  private def signatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val c = Tables.load(s, dir, "customer").select($"c_custkey", $"c_name")
    // r16 optimization: the native dl_signatures kernel replaces the
    // interpreted transform(sequence(...)) concat/overlay chain -- the
    // frame sits on BOTH branches of the q108/q218 self-joins, so each
    // record paid ~2L interpreted lambda trees per branch per
    // evaluation. String-for-string identical (DlSignaturesSpec).
    c.select($"c_custkey", $"c_name",
      posexplode(call_function("dl_signatures", $"c_name", lit(false)))
        .as(Seq("pos", "sig")))
  }

  private[queries] def entityPairsUnordered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = signatures(s, dir)
    // duplicate suppression WITHOUT a distinct shuffle: names differing
    // at exactly position p share ONLY signature p (one emission
    // already); identical names share every signature, so keep just
    // their pos-0 collision -- the join output is exactly one row per
    // candidate pair by construction
    val pairs = sigs.as("a").join(sigs.as("b"),
        $"a.sig" === $"b.sig" && $"a.c_custkey" < $"b.c_custkey" &&
          ($"a.c_name" =!= $"b.c_name" || $"a.pos" === 0))
      .select($"a.c_custkey".as("id1"), $"b.c_custkey".as("id2"),
        $"a.c_name".as("name1"), $"b.c_name".as("name2"))
    // no distance FILTER: signature equality already implies equal
    // length and agreement everywhere except the wildcard position, so
    // every join match is at levenshtein <= 1 by construction -- the
    // declared semantics hold without re-testing them, and omitting the
    // filter keeps levenshtein OUT of the join condition (Catalyst
    // would push the predicate into the join and evaluate the distance
    // twice per candidate; measured ~1.5x on the sf0.1 lane). The
    // computed dist column (always 0 or 1) still rides the output.
    pairs
      .withColumn("dist", levenshtein($"name1", $"name2"))
  }

  /** q108: customer-name entity pairs at edit distance <= 1 (same
    * length), via wildcard-signature blocking + levenshtein verify.
    * Emits one row per unordered pair with both names and the distance.
    *
    * The presentation sort rides a checkpoint: `orderBy` range
    * partitioning SAMPLES its child to pick split points, which would
    * execute the blocking join twice — materializing the pair set
    * first makes both the sample pass and the sort read the
    * already-computed rows (measured ~1.4x on the sf0.1 lane).
    */
  def q108EntityPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    entityPairsUnordered(s, dir).localCheckpoint(true).orderBy($"id1", $"id2")
  }

  /** Oracle: the all-pairs self-join the blocked plan provably equals
    * (equal length is implied by levenshtein <= 1 never holding across
    * the customer table's fixed-width names — stated explicitly anyway
    * to mirror the operator's declared same-length semantics).
    */
  val q108EntityPairsSql: String =
    """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
      |  a.c_name AS name1, b.c_name AS name2,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND length(a.c_name) = length(b.c_name)
      | AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id1, id2""".stripMargin

  /** q289: one-to-one greedy match ASSIGNMENT — the record-linkage step
    * AFTER candidate scoring (q108/q164 emit pairs, q218 merges whole
    * clusters; a links-to-one-master workflow instead needs each record
    * matched to AT MOST ONE partner, best score first). Greedy
    * maximum-weight matching processed in (score desc, a asc, b asc)
    * order — the sequential algorithm every ER toolkit ships — computed
    * DISTRIBUTEDLY as the locally-dominant-edge iteration (Preis 1999;
    * Manne & Bisseling 2007): each round accepts every edge that is
    * simultaneously its left endpoint's best and its right endpoint's
    * best under the same total order, removes matched endpoints, and
    * repeats. Under a strict total edge order the result EQUALS
    * sequential greedy (the global best edge is always locally
    * dominant, induction on its removal) — spec-pinned against a
    * sequential reference on real data. Strictness here: jw is
    * float-presented (the q164 cross-engine rule) and ties break by
    * (b asc) at a / (a asc) at b — a strict order because partners are
    * distinct within a node's edge list.
    *
    * The bipartite instance: even custkeys vs odd custkeys over q108's
    * wildcard-signature candidates (never all-pairs), scored by the
    * native jaro_winkler.
    *
    * At 100 TB: each round is two windows PARTITIONED by endpoint
    * (block-bounded frames, never unpartitioned) + two anti-joins, on
    * a frame that only shrinks; the global best edge is always
    * dominant, so every round makes progress, and locally-dominant
    * rounds converge in O(log) rounds in practice (2 rounds on this
    * corpus at both scales). A round cap FAILS LOUDLY rather than
    * silently emitting a partial matching; the oracle unrolls the same
    * iteration to the cap.
    */
  def q289GreedyMatching(s: SparkSession, dir: String,
      maxRounds: Int = GreedyMatchRounds): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    val W = org.apache.spark.sql.expressions.Window
    var e = entityPairsUnordered(s, dir)
      .filter(($"id1" % 2) =!= ($"id2" % 2))
      .select(
        when($"id1" % 2 === 0, $"id1").otherwise($"id2").as("a"),
        when($"id1" % 2 === 0, $"id2").otherwise($"id1").as("b"),
        call_function("jaro_winkler", $"name1", $"name2")
          .cast("float").as("jw"))
      .localCheckpoint(true)
    val matched = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = e.isEmpty
    while (!done) {
      require(round < maxRounds,
        s"dominant-edge matching did not converge in $maxRounds rounds")
      val wa = W.partitionBy($"a").orderBy($"jw".desc, $"b".asc)
      val wb = W.partitionBy($"b").orderBy($"jw".desc, $"a".asc)
      val d = e.withColumn("ra", row_number().over(wa))
        .withColumn("rb", row_number().over(wb))
        .filter($"ra" === 1 && $"rb" === 1)
        .select($"a", $"b", $"jw")
        .localCheckpoint(true) // feeds the union AND both anti-joins
      matched += d
      e = e.join(d.select($"a"), Seq("a"), "left_anti")
        .join(d.select($"b"), Seq("b"), "left_anti")
        .localCheckpoint(true) // bounded-round iteration: cut lineage
      round += 1
      done = e.isEmpty
    }
    matched.reduceOption(_ unionByName _).getOrElse(e.limit(0))
      .select($"a".as("even_custkey"), $"b".as("odd_custkey"), $"jw")
      .orderBy($"even_custkey")
  }

  /** Round cap shared by the operator and its unrolled oracle twin. */
  val GreedyMatchRounds: Int = 12

  def q289GreedyMatchingSql(rounds: Int = GreedyMatchRounds): String = {
    val steps = (0 until rounds).map { r =>
      val dom =
        s"""d$r AS MATERIALIZED (SELECT a, b, jw FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY a ORDER BY jw DESC, b ASC) AS ra,
           |            ROW_NUMBER() OVER (PARTITION BY b ORDER BY jw DESC, a ASC) AS rb
           |  FROM e$r) WHERE ra = 1 AND rb = 1)""".stripMargin
      val next =
        s"""e${r + 1} AS MATERIALIZED (SELECT * FROM e$r
           |  WHERE a NOT IN (SELECT a FROM d$r)
           |    AND b NOT IN (SELECT b FROM d$r))""".stripMargin
      s"$dom,\n$next"
    }.mkString(",\n")
    val union = (0 until rounds).map(r => s"SELECT * FROM d$r").mkString(" UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (
      |  SELECT a.c_custkey AS a, b.c_custkey AS b,
      |    CAST(jaro_winkler_similarity(a.c_name, b.c_name) AS FLOAT) AS jw
      |  FROM customer a JOIN customer b
      |    ON a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 1
      |   AND length(a.c_name) = length(b.c_name)
      |   AND levenshtein(a.c_name, b.c_name) <= 1),
      |$steps
      |SELECT a AS even_custkey, b AS odd_custkey, jw
      |FROM ($union)
      |-- convergence assertion: the Spark side RAISES when edges remain
      |-- past the round cap; the unrolled twin must fail identically
      |-- rather than silently return the partial matching
      |WHERE (SELECT CASE WHEN COUNT(*) > 0
      |         THEN error('dominant-edge matching did not converge in $rounds rounds')
      |         ELSE TRUE END FROM e$rounds)
      |ORDER BY even_custkey""".stripMargin
  }

  /** q164: Jaro–Winkler near-duplicate pairs over the part-NAME
    * vocabulary — the record-linkage string metric (typo tolerance
    * weighted toward prefix agreement) the q108 edit-distance lane
    * cannot express. Runs on the DISTINCT name vocabulary: the
    * vocabulary of a catalog grows sublinearly with rows (64 names
    * under 2000 parts here), so the all-pairs comparison is
    * vocabulary² — bounded — while the corpus-sized work is one
    * distinct shuffle. At a vocabulary too large for pairs², the same
    * operator composes behind q148's sorted-neighborhood blocking;
    * registered unblocked so the oracle grades the METRIC itself on
    * every pair.
    *
    * Cross-engine determinism: both engines compute the identical
    * classic formulation (0.7 boost threshold, prefix ≤ 4, scale 0.1)
    * at double precision; op-order may differ in the last ulp, so the
    * similarity is PRESENTED as float and the threshold compares the
    * float-rounded value on both sides (the q132 rounding-grid
    * argument).
    */
  def q164JaroWinkler(s: SparkSession, dir: String,
      threshold: Double = 0.75): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val names = Tables.load(s, dir, "part").select($"p_name").distinct()
    names.as("a").join(names.as("b"), $"a.p_name" < $"b.p_name")
      .select($"a.p_name".as("name1"), $"b.p_name".as("name2"),
        call_function("jaro_winkler", $"a.p_name", $"b.p_name")
          .cast("float").as("jw"))
      .filter($"jw" >= threshold.toFloat)
      .orderBy($"name1", $"name2")
  }

  val q164JaroWinklerSql: String =
    """WITH n AS (SELECT DISTINCT p_name FROM part)
      |SELECT a.p_name AS name1, b.p_name AS name2,
      |  CAST(jaro_winkler_similarity(a.p_name, b.p_name) AS FLOAT) AS jw
      |FROM n a JOIN n b ON a.p_name < b.p_name
      |WHERE CAST(jaro_winkler_similarity(a.p_name, b.p_name) AS FLOAT)
      |  >= CAST(0.75 AS FLOAT)
      |ORDER BY name1, name2""".stripMargin

  /** q164b: the q164 metric composed BEHIND sorted-neighborhood
    * blocking — the registered form of q164's own scale path ("at a
    * vocabulary too large for pairs², compose behind q148"). The
    * vocabulary sorts lexicographically (Jaro–Winkler weights prefix
    * agreement, so near-dups under the metric collide in sort order —
    * the same key/metric alignment argument as q148's min-shingle key)
    * and only rank-band neighbors within window w are verified. The
    * global rank is the q148/q163 distributed prefix pattern (range
    * partition + per-partition row_number + broadcast count offsets),
    * and the band join is the pigeonhole bucket EQUIJOIN: the lower
    * rank probes its own width-w bucket and the next one — candidate
    * count is linear in the vocabulary, never vocabulary². Like q148,
    * the oracle states the SAME windowed semantics: SNM is approximate
    * by design, the gate grades the operator's contract (window misses
    * included), and q164 remains the exact-pairs baseline beside it.
    */
  def q164bSnmJaroWinkler(s: SparkSession, dir: String,
      threshold: Double = 0.75, w: Int = 10, parts: Int = 32): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val names = Tables.load(s, dir, "part").select($"p_name").distinct()
    val (ranged, offsets) =
      Prefix.boundedPrefix(names, parts, lit(1L), $"p_name".asc)
    // checkpointed: both band-join branches probe the rank frame; the
    // cut also stops the offsets sub-job re-running per branch
    val ranked = ranged
      .withColumn("rn", row_number().over(
        W.partitionBy($"pid").orderBy($"p_name")))
      .join(broadcast(offsets), "pid")
      .select($"p_name", ($"rn" + $"off").as("r"))
      .localCheckpoint(true)
    val lower = ranked.select($"p_name".as("name1"), $"r".as("ra"),
      explode(array(expr(s"(r - 1) div $w"), expr(s"(r - 1) div $w + 1")))
        .as("bkt"))
    val upper = ranked.select($"p_name".as("name2"), $"r".as("rb"),
      expr(s"(r - 1) div $w").as("bkt"))
    // ra < rb implies name1 < name2 (the rank IS the name order), so
    // the band filter doubles as the unordered-pair canonicalizer
    lower.join(upper, "bkt")
      .filter($"rb" - $"ra" >= 1 && $"rb" - $"ra" <= w)
      .select($"name1", $"name2",
        call_function("jaro_winkler", $"name1", $"name2")
          .cast("float").as("jw"))
      .filter($"jw" >= threshold.toFloat)
      .orderBy($"name1", $"name2")
  }

  def q164bSnmJaroWinklerSql(threshold: Double = 0.75, w: Int = 10): String =
    s"""WITH n AS (SELECT DISTINCT p_name FROM part),
      |r AS (SELECT p_name,
      |        CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS r
      |      FROM n),
      |cand AS (SELECT a.p_name AS name1, b.p_name AS name2
      |         FROM r a JOIN r b ON b.r - a.r BETWEEN 1 AND $w)
      |SELECT name1, name2,
      |  CAST(jaro_winkler_similarity(name1, name2) AS FLOAT) AS jw
      |FROM cand
      |WHERE CAST(jaro_winkler_similarity(name1, name2) AS FLOAT)
      |  >= CAST($threshold AS FLOAT)
      |ORDER BY name1, name2""".stripMargin

  /** q218: survivorship / golden-record merge — the step after q108's
    * match and q45's clustering that actually FIXES the data: each
    * near-duplicate customer cluster (edit-distance-1 name matches,
    * connected transitively) collapses to one canonical record, chosen
    * by the classic survivorship policy "richest account balance wins,
    * ties to the smallest key". Components ride [[Components.ccPropagate]]
    * (one job per round, symmetrized internally); the canonical pick is
    * one argmax via max(struct) over exact decimal balances; member
    * counts and the absorbed-key list make the merge auditable. Only
    * real merges (≥2 members) emit. At 100 TB: the q108 blocking
    * bounds candidates, components are the q45 machinery, and the
    * merge is one cluster-keyed aggregate.
    *
    * Edge reduction: components only need CONNECTIVITY, not the pair
    * list, and every pair inside one signature block is mutually at
    * distance ≤ 1 (both members agree everywhere except the shared
    * wildcard position) — so the per-block STAR (each member → the
    * block's min key) is connectivity-equivalent to q108's C(k,2)
    * pairs. That replaces the signature self-join with one
    * signature-keyed min aggregate + one join back (Σ(k−1) edges
    * instead of Σ C(k,2) — strictly fewer, and never quadratic in the
    * block size), which is the 100 TB-correct edge generator for any
    * clustering consumer of a blocking scheme.
    */
  def q218Survivorship(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = signatures(s, dir).select($"c_custkey", $"sig")
    val bmin = sigs.groupBy($"sig").agg(min($"c_custkey").as("mk"))
    val pairs = sigs.join(bmin, "sig")
      .filter($"c_custkey" =!= $"mk")
      .select($"c_custkey".as("id1"), $"mk".as("id2"))
      .distinct()
    val comp = Components.ccPropagate(pairs)   // (doc_id, rep)
    val c = Tables.load(s, dir, "customer")
      .select($"c_custkey", $"c_name", Exact.d2($"c_acctbal").as("bal"))
    comp.join(c, comp("doc_id") === c("c_custkey"))
      .groupBy($"rep".as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"),
        max(struct($"bal", (-$"c_custkey").as("negk"))).as("win"),
        concat_ws(",", sort_array(collect_list($"c_custkey"))).as("member_keys"))
      .select($"cluster_rep", $"n_members",
        (-$"win.negk").as("canonical_custkey"),
        $"win.bal".cast("double").as("canonical_acctbal"),
        $"member_keys")
      .filter($"n_members" >= 2)
      .orderBy($"cluster_rep")
  }

  val q218SurvivorshipSql: String =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.c_custkey AS id1, b.c_custkey AS id2
      |  FROM customer a JOIN customer b
      |    ON a.c_custkey < b.c_custkey
      |   AND length(a.c_name) = length(b.c_name)
      |   AND levenshtein(a.c_name, b.c_name) <= 1),
      |edges AS (
      |  SELECT id1 AS u, id2 AS v FROM pairs
      |  UNION ALL SELECT id2, id1 FROM pairs),
      |reach(u, r) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      |  UNION
      |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
      |comp AS (SELECT u AS c_custkey, MIN(r) AS rep FROM reach GROUP BY u),
      |jm AS (
      |  SELECT rep, c.c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM comp JOIN customer c USING (c_custkey)),
      |canon AS (
      |  SELECT rep, c_custkey AS canonical_custkey,
      |    CAST(bal AS DOUBLE) AS canonical_acctbal
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY rep
      |          ORDER BY bal DESC, c_custkey) AS rk FROM jm)
      |  WHERE rk = 1),
      |agg AS (
      |  SELECT rep AS cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_members,
      |    array_to_string(list_sort(list(c_custkey)), ',') AS member_keys
      |  FROM jm GROUP BY rep)
      |SELECT cluster_rep, n_members, canonical_custkey, canonical_acctbal,
      |  member_keys
      |FROM agg JOIN canon ON canon.rep = agg.cluster_rep
      |WHERE n_members >= 2 ORDER BY cluster_rep""".stripMargin

  /** q277: transposition-aware typo pairs — same-length customer names
    * at UNRESTRICTED Damerau–Levenshtein ≤ 1 (native
    * [[graft.functions.DamerauLevenshtein]] expression), the metric
    * that scores an adjacent-character swap (the dominant human typo
    * class, Damerau 1964) as ONE edit where q108's plain Levenshtein
    * charges two. Emits both distances; the `lev = 2, dl = 1` rows are
    * exactly the adjacent-transposition matches the q108 lane cannot
    * reach (e.g. `…012` vs `…021`).
    *
    * Blocking: TWO signature families, partitioning same-length
    * DL ≤ 1 exactly by edit kind. Same-length DL ≤ 1 is exactly
    * {equal, one substitution at some p, one adjacent transposition
    * at some (p, p+1)} (insert/delete change length). Family one is
    * q108's single-wildcard signature (position p replaced by a
    * sentinel): two unequal names collide iff they differ by exactly
    * one substitution, at exactly that position's signature. Family
    * two is the position-prefixed SORTED-WINDOW signature (adjacent
    * window (p, p+1) replaced by its two chars in sorted order): two
    * unequal names collide iff exactly those two chars swap at that
    * window — a substitution inside the window changes the multiset,
    * so it cannot collide here, and at any other window a swapped
    * position stays visible and differs. So every unequal DL ≤ 1
    * pair collides EXACTLY ONCE across the union: the equijoin is
    * complete, candidates are at DL ≤ 1 by construction, and NO
    * verify filter, NO dedup, NO distinct is needed. Equal names
    * collide at every signature; a pos == 0 gate keeps one row.
    *
    * At 100 TB: same shape as q108 — map-side explode (2L−1
    * signatures per record), ONE signature-keyed shuffle, blocks
    * bounded by "agree everywhere except one position / one
    * unordered adjacent pair". The codegen'd DP runs only to EMIT
    * both distances per emitted pair, never to filter. No all-pairs
    * step; the oracle twin is the quadratic self-join this lane
    * exists to avoid.
    */
  private[queries] def damerauPairsUnordered(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    import s.implicits._
    val c = Tables.load(s, dir, "customer").select($"c_custkey", $"c_name")
    // TWO signature families in ONE exploded frame / ONE shuffle,
    // partitioning same-length DL <= 1 EXACTLY by edit kind:
    //  - positions 0..L-1: q108's single-wildcard signatures -- two
    //    unequal names collide iff they differ by exactly one
    //    substitution, at exactly that position's signature;
    //  - positions L..2L-2: SORTED-WINDOW signatures (adjacent window
    //    (p, p+1) replaced by its two chars in sorted order) -- two
    //    unequal names collide iff chars (x,y)/(y,x) swap at that
    //    window and all else agrees, i.e. exactly one adjacent
    //    transposition, at exactly that window's signature (a
    //    substitution inside the window changes the MULTISET, so it
    //    cannot collide here; at any other window a swapped position
    //    stays visible and differs).
    // So every unequal DL<=1 pair collides EXACTLY ONCE across the
    // union, candidates are at DL <= 1 BY CONSTRUCTION (no verify, no
    // dedup, no distinct), and blocks are "agree everywhere except one
    // position / one unordered adjacent pair" -- tiny, unlike the
    // earlier double-wildcard blocks whose C(k,2) fan-out this
    // replaced (the sf0.1 digit blocks reached 100 members). Equal
    // names collide at every signature; the pos == 0 gate keeps one
    // row. Family strings cannot cross-collide: single-wildcard sigs
    // contain the \u0000 sentinel, sorted-window sigs cannot.
    // The WINDOW POSITION is part of the sorted-window signature: the
    // wildcard family gets positional disjointness for free from the
    // sentinel (a name never contains \u0000, so sigs wildcarded at
    // different positions cannot align), but a sorted window is made
    // of ordinary characters -- without the p prefix, "baab"@1 and
    // "abba"@3 both sort to "abab" and a DL-2 double-transposition
    // pair would slip in as a candidate. Both families now ride the
    // native dl_signatures kernel (r16: the interpreted two-chain
    // transform(sequence(...)) builder paid ~2*(2L-1) lambda trees per
    // record per join branch); array order -- single then windows --
    // is unchanged, so posexplode positions and the pos == 0
    // equal-name gate are identical (DlSignaturesSpec pins string
    // equality against the declarative spelling).
    val sigs = c.select($"c_custkey", $"c_name",
      posexplode(call_function("dl_signatures", $"c_name", lit(true)))
        .as(Seq("pos", "sig")))
    // dl/lev are OUTPUT columns only (never join-condition predicates --
    // the q108 lesson: Catalyst would push them into the join and run
    // the DP twice per candidate); dl is 0 or 1 by construction, the
    // native expression keeps the declared metric on the emitted rows
    sigs.as("a").join(sigs.as("b"),
        $"a.sig" === $"b.sig" && $"a.c_custkey" < $"b.c_custkey" &&
          ($"a.c_name" =!= $"b.c_name" || $"a.pos" === 0))
      .select($"a.c_custkey".as("id1"), $"b.c_custkey".as("id2"),
        $"a.c_name".as("name1"), $"b.c_name".as("name2"))
      .withColumn("dl", call_function("damerau_levenshtein", $"name1", $"name2"))
      .withColumn("lev", levenshtein($"name1", $"name2"))
  }

  def q277DamerauTypos(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // presentation sort over a checkpoint: orderBy's range sampler
    // would otherwise re-execute the blocking join (the q108 lesson)
    damerauPairsUnordered(s, dir).localCheckpoint(true).orderBy($"id1", $"id2")
  }

  /** Oracle: the all-pairs self-join the blocked plan provably equals
    * (DuckDB's `damerau_levenshtein` is the same unrestricted
    * Lowrance–Wagner variant the native expression implements;
    * integer distances → exact compare).
    */
  val q277DamerauTyposSql: String =
    """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
      |  a.c_name AS name1, b.c_name AS name2,
      |  CAST(damerau_levenshtein(a.c_name, b.c_name) AS INT) AS dl,
      |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND length(a.c_name) = length(b.c_name)
      | AND damerau_levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id1, id2""".stripMargin

  /** Round count shared by q297 and its unrolled oracle twin. */
  val FsEmRounds: Int = 5

  /** q297: Fellegi–Sunter probabilistic record linkage with
    * EM-estimated parameters (Fellegi & Sunter 1969; the EM fitting is
    * Winkler 1988's unsupervised variant) — THE classical framework
    * the deterministic lanes here (q108 edit-distance blocking, q164
    * Jaro–Winkler, q289 dominant-edge matching) plug into: instead of
    * a hand-picked similarity threshold, the match/non-match field
    * agreement rates m_k = P(field k agrees | match) and
    * u_k = P(agrees | non-match) plus the match prevalence p are
    * FITTED to the candidate-pair population, and a pair's match
    * weight is Σ log(m_k/u_k) over agreeing fields (the output ships
    * the per-field log₂-style weights serving systems threshold on).
    *
    * Candidate pairs: even-key × odd-key customers blocked on
    * nationkey; comparison vector γ = agreement on market segment and
    * on three balance-derived fields of very different selectivities —
    * the thousand-dollar band, the fractional cents, and the last
    * dollar digit (all from shifted integer cents c2 = round(bal·100)
    * + 100000, which keeps `div`/`%` on non-negative operands where
    * Spark and DuckDB agree; the money-cents recipe makes the DOUBLE
    * source exact on both engines).
    *
    * The EM is fitted on a BOUNDED per-block record sample — each
    * (nation, parity) block contributes its first `cap` records in
    * stable-md5 order (a WindowGroupLimit rank filter: map-side
    * pruning, no global sort) — which is Winkler's production
    * practice: parameters are fitted on a pair sample and then score
    * any candidate stream; fitting on every pair is O(block²) waste.
    * Measured before the cap: ×330 at the derived decade (block sizes
    * grow linearly with the corpus, pairs quadratically — 897 s at
    * sf1d); with it, fit cost is ≤ blocks·cap² pairs at ANY corpus
    * size. At the test scales every block is under the cap, so the
    * sample IS the full pair set and the oracle states the same rows.
    *
    * Cross-engine EM under the oracle gate: the E-step responsibility
    * g is QUANTIZED to floor(g·10⁶) per pair (the q236/q250 micro-nat
    * recipe), so every M-step statistic is an exact BIGINT sum —
    * order-free under any partitioning — and the next round's (m, u,
    * p) are single fixed-shape divisions of exact integers. Five
    * rounds, unrolled identically in the oracle.
    *
    * At 100 TB: pairs = one blocked equijoin (block sizes are
    * data-bounded by the blocking key's frequency — the q108
    * discipline), checkpointed once; each EM round is ONE map-side
    * partial aggregate over it (9 sums), params ride a broadcast
    * 1-row frame — no driver-side loop state beyond the bounded round
    * count, no collect of anything data-sized.
    */
  def q297FellegiSunter(s: SparkSession, dir: String,
      rounds: Int = FsEmRounds, cap: Int = 400): DataFrame = {
    import s.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val recs = Tables.load(s, dir, "customer")
      .select($"c_custkey".as("id"), $"c_nationkey".as("nat"),
        $"c_mktsegment".as("mkt"),
        expr("cast(round(c_acctbal * 100) as bigint) + 100000").as("c2"))
      .select($"id", $"nat", $"mkt",
        expr("c2 div 100000").as("band"),
        expr("c2 % 100").as("cents"),
        expr("(c2 div 100) % 10").as("digit"))
    // bounded per-(nation, parity) sample in stable-md5 order: raw-rank
    // filter (no cast between row_number and <=) keeps WindowGroupLimit
    def sampled(side: DataFrame, idCol: String): DataFrame = {
      val w = W.partitionBy($"nat")
        .orderBy(md5(concat(lit("fs:"), col(idCol).cast("string"))).asc,
          col(idCol).asc)
      side.withColumn("rn", row_number().over(w))
        .filter($"rn" <= cap).drop("rn")
    }
    val b = recs.select($"id".as("id_b"), $"nat", $"mkt".as("mkt_b"),
      $"band".as("band_b"), $"cents".as("cents_b"), $"digit".as("digit_b"))
    val pairs = sampled(recs.filter($"id" % 2 === 0), "id")
      .join(sampled(b.filter($"id_b" % 2 === 1), "id_b"), "nat")
      .select(($"mkt" === $"mkt_b").as("g1"), ($"band" === $"band_b").as("g2"),
        ($"cents" === $"cents_b").as("g3"), ($"digit" === $"digit_b").as("g4"))
      .localCheckpoint(true) // re-read once per EM round
    def emRound(prev: DataFrame): DataFrame = {
      val j = pairs.crossJoin(broadcast(prev))
      def t(g: String, q: String) = when(col(g), col(q)).otherwise(lit(1.0) - col(q))
      val num = col("p") * t("g1", "m1") * t("g2", "m2") * t("g3", "m3") * t("g4", "m4")
      val den = (lit(1.0) - col("p")) *
        t("g1", "u1") * t("g2", "u2") * t("g3", "u3") * t("g4", "u4")
      val g = num / (num + den)
      val aggExprs = Seq(sum($"gq").as("sg"), count(lit(1)).as("n")) ++
        (1 to 4).flatMap(i => Seq(
          sum(when(col(s"g$i"), $"gq").otherwise(0L)).as(s"sg$i"),
          sum(when(col(s"g$i"), lit(1000000L) - $"gq").otherwise(0L)).as(s"sd$i")))
      val agg = j.select(floor(g * lit(1000000.0)).cast("long").as("gq"),
          $"g1", $"g2", $"g3", $"g4")
        .agg(aggExprs.head, aggExprs.tail: _*)
      agg.select((Seq(($"sg" / ($"n" * lit(1000000.0))).as("p"), $"n") ++
        (1 to 4).flatMap(i => Seq(
          (col(s"sg$i").cast("double") / $"sg").as(s"m$i"),
          (col(s"sd$i").cast("double") / ($"n" * lit(1000000L) - $"sg")).as(s"u$i")))): _*)
    }
    val init = Seq((0.9, 0.9, 0.9, 0.9, 0.1, 0.1, 0.1, 0.1, 0.05))
      .toDF("m1", "m2", "m3", "m4", "u1", "u2", "u3", "u4", "p")
    val fitted = (1 to rounds).foldLeft(init: DataFrame)((prm, _) => emRound(prm))
    val fields = Seq("mkt", "band", "cents", "digit")
    fitted.select((Seq($"n".as("n_pairs"), $"p") ++
      fields.zipWithIndex.flatMap { case (f, i0) =>
        val i = i0 + 1
        Seq(col(s"m$i").as(s"m_$f"), col(s"u$i").as(s"u_$f"),
          log(col(s"m$i") / col(s"u$i")).cast("float").as(s"w_$f"))
      }): _*)
      .orderBy($"n_pairs")
  }

  def q297FellegiSunterSql(rounds: Int = FsEmRounds, cap: Int = 400): String = {
    val aggCols = (1 to 4).map(i =>
      s"""CAST(SUM(CASE WHEN g$i THEN gq ELSE 0 END) AS BIGINT) AS sg$i,
         |    CAST(SUM(CASE WHEN g$i THEN 1000000 - gq ELSE 0 END) AS BIGINT) AS sd$i""".stripMargin)
      .mkString(",\n    ")
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"""e$r AS (SELECT CAST(SUM(gq) AS BIGINT) AS sg, CAST(COUNT(*) AS BIGINT) AS n,
         |    $aggCols
         |  FROM (SELECT g1, g2, g3, g4,
         |          CAST(floor((num / (num + den)) * 1000000.0) AS BIGINT) AS gq
         |        FROM (SELECT g1, g2, g3, g4,
         |          p * (CASE WHEN g1 THEN m1 ELSE CAST(1.0 AS DOUBLE) - m1 END)
         |            * (CASE WHEN g2 THEN m2 ELSE CAST(1.0 AS DOUBLE) - m2 END)
         |            * (CASE WHEN g3 THEN m3 ELSE CAST(1.0 AS DOUBLE) - m3 END)
         |            * (CASE WHEN g4 THEN m4 ELSE CAST(1.0 AS DOUBLE) - m4 END) AS num,
         |          (CAST(1.0 AS DOUBLE) - p)
         |            * (CASE WHEN g1 THEN u1 ELSE CAST(1.0 AS DOUBLE) - u1 END)
         |            * (CASE WHEN g2 THEN u2 ELSE CAST(1.0 AS DOUBLE) - u2 END)
         |            * (CASE WHEN g3 THEN u3 ELSE CAST(1.0 AS DOUBLE) - u3 END)
         |            * (CASE WHEN g4 THEN u4 ELSE CAST(1.0 AS DOUBLE) - u4 END) AS den
         |        FROM pairs CROSS JOIN r$p))),
         |r$r AS (SELECT sg / (n * 1000000.0) AS p, n,
         |    CAST(sg1 AS DOUBLE) / sg AS m1, CAST(sd1 AS DOUBLE) / (n * 1000000 - sg) AS u1,
         |    CAST(sg2 AS DOUBLE) / sg AS m2, CAST(sd2 AS DOUBLE) / (n * 1000000 - sg) AS u2,
         |    CAST(sg3 AS DOUBLE) / sg AS m3, CAST(sd3 AS DOUBLE) / (n * 1000000 - sg) AS u3,
         |    CAST(sg4 AS DOUBLE) / sg AS m4, CAST(sd4 AS DOUBLE) / (n * 1000000 - sg) AS u4
         |  FROM e$r)""".stripMargin
    }.mkString(",\n")
    val out = Seq("mkt" -> 1, "band" -> 2, "cents" -> 3, "digit" -> 4).map { case (f, i) =>
      s"m$i AS m_$f, u$i AS u_$f, CAST(ln(m$i / u$i) AS FLOAT) AS w_$f"
    }.mkString(",\n  ")
    s"""WITH recs AS (SELECT id, nat, mkt, c2 // 100000 AS band,
      |    c2 % 100 AS cents, (c2 // 100) % 10 AS digit
      |  FROM (SELECT c_custkey AS id, c_nationkey AS nat,
      |          c_mktsegment AS mkt,
      |          CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS c2
      |        FROM customer)),
      |ev AS (SELECT * FROM recs WHERE id % 2 = 0
      |  QUALIFY row_number() OVER (PARTITION BY nat
      |    ORDER BY md5('fs:' || CAST(id AS VARCHAR)), id) <= $cap),
      |od AS (SELECT * FROM recs WHERE id % 2 = 1
      |  QUALIFY row_number() OVER (PARTITION BY nat
      |    ORDER BY md5('fs:' || CAST(id AS VARCHAR)), id) <= $cap),
      |pairs AS MATERIALIZED (
      |  SELECT a.mkt = b.mkt AS g1, a.band = b.band AS g2,
      |         a.cents = b.cents AS g3, a.digit = b.digit AS g4
      |  FROM ev a JOIN od b ON a.nat = b.nat),
      |r0 AS (SELECT CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
      |    CAST(0.9 AS DOUBLE) AS m3, CAST(0.9 AS DOUBLE) AS m4,
      |    CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
      |    CAST(0.1 AS DOUBLE) AS u3, CAST(0.1 AS DOUBLE) AS u4,
      |    CAST(0.05 AS DOUBLE) AS p),
      |$steps
      |SELECT n AS n_pairs, p,
      |  $out
      |FROM r$rounds ORDER BY n_pairs""".stripMargin
  }
}
