package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution over a name column — the
  * canonicalize-then-link shape of Fellegi & Sunter (JASA 1969) with
  * the standard blocking stage (Newcombe et al., Science 1959): a
  * catalog at scale holds near-duplicate entity NAMES ("blue bolt" /
  * "blue bol", re-listed products, typo'd brands) that exact dedup
  * ([[Dedup]]) cannot see and embedding dedup ([[Similarity]]) only
  * sees if an encoder exists for the domain. Edit distance is the
  * classic lexical fallback.
  *
  * The reference resolves entities by exact id equality only (its KOL
  * joins key on `kol_id`, e.g. `batch/etl/feature_engineering.py`
  * join chains); fuzzy linkage is a beyond-reference training-data
  * operator (catalog/author dedup before mining interaction graphs).
  *
  * Shape — three stages, each bounded:
  *  1. CANONICALIZE: one hash aggregate to (name, n_members). The
  *     distinct-name frame is orders of magnitude smaller than the
  *     record table (64 names over 2k..200k parts in the testdata;
  *     ~10⁶ names over 10⁹ rows in a real catalog) — all pairwise work
  *     happens on it, never on records.
  *  2. BLOCK: a deterministic key (here the last whitespace token — the
  *     head noun of a product name) bounds the candidate quadratic to
  *     within-block pairs. A hot block is exactly a skewed join key:
  *     observable via [[blockStats]], mitigable by salting the block
  *     key with a name-prefix byte (the q38 LSH-bucket discipline).
  *  3. MATCH: within-block self-join under `name_a < name_b` (each
  *     unordered pair once), `levenshtein ≤ maxDist`. Both engines
  *     implement unit-cost insert/delete/substitute edit distance, so
  *     the oracle replays bit-identically.
  *
  * Output: (name_a, name_b, dist, n_a, n_b) — the linked name pairs
  * with their member counts (the mass a merge would move). Downstream,
  * pairs feed [[Dedup.connectedComponents]] for transitive entity
  * clusters exactly like near-dup pairs do.
  */
object Linkage {

  /** (name, n_members) — the canonical entity-name frame. Null/empty
    * names are dropped (they link to nothing meaningfully).
    */
  def canonicalNames(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).as("name"))
      .where(col("name").isNotNull && length(col("name")) > 0)
      .groupBy("name").agg(count(lit(1)).as("n_members"))

  /** Block-size observability: (block, n_names) per blocking key —
    * the skew monitor for stage 2 (a hot block re-introduces the
    * quadratic; salt its key when this view flags one).
    */
  def blockStats(df: DataFrame, nameCol: String): DataFrame =
    canonicalNames(df, nameCol)
      .select(element_at(split(col("name"), " "), -1).as("block"))
      .groupBy("block").agg(count(lit(1)).as("n_names"))

  /** Fuzzy name pairs: within-block levenshtein ≤ `maxDist` over the
    * canonical name frame. `dist ≥ 1` by construction (identical names
    * collapsed in stage 1 — exact duplicates are [[Dedup]]'s job).
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val canon = canonicalNames(df, nameCol)
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = canon.select(col("block"), col("name").as("name_a"),
      col("n_members").as("n_a"))
    val b = canon.select(col("block"), col("name").as("name_b"),
      col("n_members").as("n_b"))
    a.join(b, Seq("block"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
