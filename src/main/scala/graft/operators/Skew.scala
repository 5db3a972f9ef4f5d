package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — the portable answer to hot keys.
  *
  * A plain `groupBy(key)` over a skewed corpus sends EVERY row of the
  * hottest key to one reducer: at 100 TB a "language = en" or
  * "event_type = view" partition is a single straggler task holding
  * half the table. AQE can split skewed JOIN partitions, but a skewed
  * final AGGREGATION on a low-cardinality key is still one task per
  * key. Salting fixes it structurally:
  *
  *   phase 1: groupBy(key, salt) — the hot key's rows spread over
  *            `nSalts` reducers, each emitting one partial row;
  *   phase 2: groupBy(key) over ≤ nSalts partials per key — trivially
  *            small, whatever the input skew.
  *
  * Correct for ALGEBRAIC aggregates (count/sum/min/max merge
  * associatively), which is what this exposes. The salt is a pure
  * function of a caller-named per-row column (`pmod(hash(saltFrom),
  * nSalts)`), so the row→salt assignment is deterministic under task
  * retries and the plan is reproducible — never a random number.
  *
  * Sums are integer cents (`round(value·100)` as int64) so phase-2
  * merge order cannot perturb the result — bit-exact vs the unsalted
  * aggregation and vs any SQL engine.
  */
object Skew {

  /** count / sum-cents / min-cents / max-cents per key, computed via the
    * two-phase salted plan. Output ≡ the plain single-phase groupBy
    * (spec-pinned), but no reducer ever sees more than ~1/nSalts of a
    * hot key's rows.
    */
  def saltedStats(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltFrom: String,
      nSalts: Int = 16,
  ): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val cents = round(col(valueCol) * 100).cast("long")
    val partials = df
      .withColumn("graft_salt", pmod(hash(col(saltFrom)), lit(nSalts)))
      .groupBy(col(keyCol), col("graft_salt"))
      .agg(
        count(lit(1)).as("graft_n"),
        sum(cents).as("graft_sum"),
        min(cents).as("graft_min"),
        max(cents).as("graft_max"))
    partials
      .groupBy(col(keyCol))
      .agg(
        sum(col("graft_n")).as("n_rows"),
        sum(col("graft_sum")).as("sum_value_cents"),
        min(col("graft_min")).as("min_value_cents"),
        max(col("graft_max")).as("max_value_cents"))
  }

  /** The unsalted reference plan (one exchange, one hot reducer per
    * key) — what [[saltedStats]] must equal, and what you'd run when
    * the key is known to be well-distributed.
    */
  def plainStats(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(cents).as("sum_value_cents"),
        min(cents).as("min_value_cents"),
        max(cents).as("max_value_cents"))
  }

  /** Salted equi-join for a skewed FACT side against a dimension too
    * big to broadcast: the fact side salts deterministically
    * (`pmod(hash(saltFrom), nSalts)`), the dimension replicates once
    * per salt (an `explode` of a literal range — nSalts·|dim| rows,
    * fine for any dimension that was already shuffle-joined), and the
    * join runs on (key, salt) — the hot key's rows spread over nSalts
    * reducers instead of one straggler. Result ≡ the plain inner join
    * column-for-column; AQE's skew splitting is the runtime fallback,
    * this is the structural fix you pick when the skew is known.
    *
    * Join-key and salt columns stay internal; output = fact columns ++
    * dimension payload columns (dimension must not duplicate `keyCol`
    * values — standard dimension contract).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      saltFrom: String,
      nSalts: Int = 16,
  ): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val salted = fact.withColumn("graft_salt", pmod(hash(col(saltFrom)), lit(nSalts)))
    val replicated = dim
      .withColumn("graft_salt", explode(lit((0 until nSalts).toArray)))
    salted
      .join(replicated, Seq(keyCol, "graft_salt"))
      .drop("graft_salt")
  }
}
