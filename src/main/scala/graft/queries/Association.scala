package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket association rules — support / confidence / lift over
  * part pairs co-occurring in orders, the classic "what sells together"
  * mining (Agrawal's apriori, specialized to the 2-itemset level a
  * relational engine answers directly).
  *
  * At 100 TB: the basket frame shuffles once on the basket key; the
  * apriori property prunes items below minimum support BEFORE the pair
  * self-join (an infrequent item cannot be in a frequent pair), and the
  * frequent-item set broadcasts. The pair join's cost is Σ k_i·(k_i−1)/2
  * over FREQUENT items per basket — bounded by basket width, never by
  * corpus size — and the pair aggregation is one (p1, p2)-keyed shuffle.
  * The statistics are single fixed-shape divisions over exact integer
  * counts (support, confidence) and one double-first product chain
  * (lift — pair·N would overflow long at corpus scale), textually
  * mirrored in the oracle, so every double is bit-identical cross-engine.
  */
object Association {

  /** q161: association rules over part pairs within orders. Each
    * surviving unordered pair (p1 < p2) reports its basket counts, the
    * pair support, both directed confidences, and lift.
    */
  def q161AssocRules(s: SparkSession, dir: String,
      minItemCnt: Long = 25L, minPairCnt: Long = 2L): DataFrame = {
    import s.implicits._
    // one (order, part) row per basket membership: the DISTINCT guards
    // against a part appearing on two lines of one order
    val baskets = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey".as("k"), $"l_partkey".as("p")).distinct()
    val itemCnt = baskets.groupBy($"p").agg(count(lit(1)).as("cnt"))
    val frequent = itemCnt.filter($"cnt" >= minItemCnt)
    // apriori prune: only frequent items enter the pair join
    val fb = baskets.join(broadcast(frequent.select($"p")), Seq("p"))
    val pairs = fb.as("a").join(fb.as("b"),
        $"a.k" === $"b.k" && $"a.p" < $"b.p")
      .groupBy($"a.p".as("p1"), $"b.p".as("p2"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter($"pair_cnt" >= minPairCnt)
    val n = baskets.select($"k").distinct().agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(frequent.select($"p".as("p1"), $"cnt".as("cnt1"))), Seq("p1"))
      .join(broadcast(frequent.select($"p".as("p2"), $"cnt".as("cnt2"))), Seq("p2"))
      .crossJoin(broadcast(n))
      .select($"p1", $"p2", $"pair_cnt", $"cnt1", $"cnt2",
        ($"pair_cnt".cast("double") / $"n_baskets").as("support"),
        ($"pair_cnt".cast("double") / $"cnt1").as("conf_1_2"),
        ($"pair_cnt".cast("double") / $"cnt2").as("conf_2_1"),
        ($"pair_cnt".cast("double") * $"n_baskets" /
          ($"cnt1".cast("double") * $"cnt2")).as("lift"))
      .orderBy($"p1", $"p2")
  }

  val q161AssocRulesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
      |ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
      |f AS (SELECT p, cnt FROM ic WHERE cnt >= 25),
      |fb AS (SELECT b.k, b.p FROM b JOIN f ON b.p = f.p),
      |pairs AS (
      |  SELECT a.p AS p1, b2.p AS p2, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      |  FROM fb a JOIN fb b2 ON a.k = b2.k AND a.p < b2.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |n AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_baskets FROM b)
      |SELECT p1, p2, pair_cnt, f1.cnt AS cnt1, f2.cnt AS cnt2,
      |  CAST(pair_cnt AS DOUBLE) / n_baskets AS support,
      |  CAST(pair_cnt AS DOUBLE) / f1.cnt AS conf_1_2,
      |  CAST(pair_cnt AS DOUBLE) / f2.cnt AS conf_2_1,
      |  CAST(pair_cnt AS DOUBLE) * n_baskets /
      |    (CAST(f1.cnt AS DOUBLE) * f2.cnt) AS lift
      |FROM pairs
      |JOIN f f1 ON p1 = f1.p
      |JOIN f f2 ON p2 = f2.p
      |CROSS JOIN n
      |ORDER BY p1, p2""".stripMargin
}
