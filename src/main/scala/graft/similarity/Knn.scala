package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) probe set,
  * score every corpus row, per-probe top-k via window. Linear in corpus
  * size, embarrassingly parallel — at 100 TB this is the right shape when
  * the probe set is small (the corpus never shuffles; only k rows per
  * probe per partition survive the partial rank).
  *
  * `lshBuckets` is the sub-linear scale path: random-hyperplane signatures
  * with multiple independent tables; probes only score candidates sharing
  * a bucket in at least one table. Probabilistic recall (tune tables up).
  */
object Knn {

  /** Exact top-k: one row per (query_id, rnk) with the neighbor id.
    * Ties pinned by neighbor id asc. Self-matches excluded.
    */
  def bruteForce(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(broadcast(p))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** LSH-bucketed ANN: `tables` independent hyperplane signatures; union
    * of bucket collisions forms the candidate set, exact cosine ranks it.
    * Returns (query_id, neighbor_id, rnk) like bruteForce; rows may be
    * fewer than k when buckets are sparse.
    */
  def lshBuckets(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nPlanes: Int = 10,
      tables: Int = 4, seed: Long = 42L): DataFrame = {
    def sigs(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val tableCols = (0 until tables).map { t =>
        struct(lit(t).as("table_idx"),
          VectorFunctions.hyperplaneSignature(col(vecCol), dim, nPlanes, seed + t).as("bucket"))
      }
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        explode(array(tableCols: _*)).as("s"))
        .select(col(idAs), col(vecAs), col("s.table_idx"), col("s.bucket"))
    }
    val c = sigs(corpus, "neighbor_id", "c_vec")
    val p = sigs(probes, "query_id", "q_vec")
    val candidates = c.join(broadcast(p), Seq("table_idx", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }
}
