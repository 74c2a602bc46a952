package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBloom

/** Bloom-pruned semi join — the manual form of Spark's runtime row-level
  * filtering, for when the dim side is the result of computation AQE
  * cannot see through (or the join spans two jobs, e.g. a persisted key
  * set probed by a later pipeline stage).
  *
  * Shape: the dim's join keys aggregate into ONE bloom filter (driver
  * collects `numBits/8` bytes — ~1.2 MB for 1M keys at 1% fpp, bounded
  * and independent of the fact size), which ships back as a foldable
  * BINARY literal inside a scan-level filter on the fact. False
  * positives are then removed by the exact semi join — the bloom never
  * changes the answer, only how many fact rows reach the shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~selectivity fraction that can possibly
  * match: the probe is a codegen'd hash + bit test evaluated before the
  * exchange (spec-proven below the join in the plan).
  */
object BloomJoin {

  /** Optimal bloom sizing for `n` items at false-positive rate `fpp`:
    * bits = -n·ln(fpp)/ln(2)², the standard formula.
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Fact rows whose `factKey` appears in `dim.dimKey` (exact left-semi
    * semantics), with the bloom prefilter cutting the fact-side shuffle.
    *
    * @param expectedItems approximate count of DISTINCT dim keys (sizing
    *                      only — correctness never depends on it)
    */
  def semiJoinPruned(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = optimalNumBits(expectedItems, fpp)
    // The bloom compares xxhash64 values, and Spark hashes INT and
    // BIGINT differently — so two integral key columns of different
    // widths (which the equality join below would happily match via
    // implicit cast) must hash through a COMMON type, or equal keys get
    // different hashes and the bloom silently drops matching fact rows.
    // Integral families widen to long for hashing; any other type pair
    // must match exactly.
    import org.apache.spark.sql.types._
    def hashType(t: DataType): DataType = t match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case other => other
    }
    val ft = hashType(fact.schema(factKey).dataType)
    val dt = hashType(dim.schema(dimKey).dataType)
    require(ft == dt,
      s"bloom join keys must share a hashable type: '$factKey' is " +
        s"${fact.schema(factKey).dataType}, '$dimKey' is " +
        s"${dim.schema(dimKey).dataType} — xxhash64 would disagree and " +
        "the bloom would produce false NEGATIVES")
    def hashed(c: org.apache.spark.sql.Column, orig: DataType) =
      if (orig == ft) xxhash64(c) else xxhash64(c.cast(ft))
    // materialize the distinct keys ONCE — the dim is typically the
    // result of computation (that's the operator's reason to exist), and
    // without the barrier its plan would run twice: once under the bloom
    // aggregate's collect, again inside the returned join
    val keys = dim.select(col(dimKey)).distinct().localCheckpoint()
    val bloom = keys
      .agg(GraftBloom.bloomAgg(
          hashed(col(dimKey), dim.schema(dimKey).dataType),
          expectedItems, numBits)
        .as("__bloom"))
      .head.getAs[Array[Byte]](0)
    // empty dim: the aggregate yields NULL — the exact join below returns
    // the correct empty result, so skip the (null) prefilter entirely
    val pruned =
      if (bloom == null) fact
      else fact.filter(GraftBloom.mightContain(bloom,
        hashed(col(factKey), fact.schema(factKey).dataType)))
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }
}
