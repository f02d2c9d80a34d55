package graft.queries

import graft.Tables
import graft.operators.Similarity
import graft.functions.TextFunctions.round4hu
import org.apache.spark.sql.functions._

/** Embedding similarity-search coverage on the `embeddings` table.
  *
  *  - q36 brute-force cosine top-k ANN baseline — exact DuckDB oracle via
  *    `list_cosine_similarity` over DOUBLE[] (same left-to-right double
  *    accumulation as VectorFunctions.cosine, so rank order matches).
  *  - q39 LSH-bucketed ANN (rows-only: the hyperplane construction uses
  *    xxhash64, which DuckDB can't reproduce) + bucket occupancy stats.
  */
object VectorOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q36_cosine_topk",
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
        |scored AS (
        |  SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos
        |  FROM q CROSS JOIN c WHERE qid <> nid),
        |ranked AS (
        |  SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored)
        |SELECT qid, nid, floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteForceTopK(emb.filter(col("id") < 10), emb, k = 5)
        .select(col("qid"), col("nid"), round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    QueryDef.rowsOnly("q39_lsh_ann") { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding"))
      Similarity.lshTopK(emb.filter(col("id") < 10), emb, k = 3, nPlanes = 4)
        .select(col("qid"), col("bucket"), col("nid"),
          round4hu(col("cosine")).as("cosine"), col("rank"))
    },

    QueryDef.rowsOnly("q40_multimodal_features") { (s, d) =>
      graft.operators.Multimodal.featureStats(
        graft.operators.Multimodal.fromDocuments(Tables.documents(s, d)))
    }
  )
}
