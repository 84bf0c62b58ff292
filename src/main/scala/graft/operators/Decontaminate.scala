package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination for LLM training pipelines: find eval
  * documents whose n-grams leak into the training corpus (the standard
  * benchmark-contamination check — e.g. GPT-3's 13-gram and PaLM's
  * 8-gram overlap filters, both public methodology).
  *
  * Shape at 100 TB:
  *   - train side reduces to the DISTINCT n-gram HASH set (xxhash64 of
  *     the joined token window — one 8-byte column, never the strings;
  *     map-side distinct-partials before the shuffle);
  *   - eval side carries (doc_id, hash) pairs, again bare 16 bytes;
  *   - one hash equi-join (AQE handles the hot-n-gram skew), then a
  *     per-doc distinct count.
  *   The strings themselves never shuffle. A 64-bit hash collision can
  *   at worst flag one extra n-gram as contaminated (conservative
  *   direction — decontamination over-removes, never under-removes);
  *   with ~2^37 distinct n-grams per PB the collision rate is
  *   negligible and documented rather than pretended away.
  *
  * Tokenization is the engine-wide whitespace split so an oracle can
  * re-derive the n-gram set exactly.
  */
object Decontaminate {

  /** N-grams of the token array as (start-anchored) space-joined
    * strings: tokens.sliding(n). Documents shorter than n contribute
    * none.
    */
  private def ngramsCol(textCol: String, n: Int) = {
    val toks = split(col(textCol), " ")
    // transform over 0..len-n: slice+join — codegen'd, no UDF
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks),
          array_join(slice(toks, i + 1, lit(n)), " "))
      ),
      g => g.isNotNull
    )
  }

  /** Per-eval-doc contamination counts: (idCol, n_hit, n_ngrams) for
    * eval docs with ≥1 distinct n-gram present in train; `n_hit` counts
    * DISTINCT leaked n-grams, `n_ngrams` the doc's distinct n-gram
    * total (so callers can threshold on a leak FRACTION, the usual
    * policy). Empty-text rows contribute nothing.
    */
  def ngramOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): DataFrame = {
    require(n >= 1, "n must be positive")
    // distinct on the HASH alone (the marker column is constant): the
    // distinct's exchange is then HashPartitioning(gh), which the gh
    // equi-join below consumes without a second exchange of the train
    // side (r6 opt round; guide §2.4 — the old (gh, in_train) distinct
    // key made the join re-shuffle what the distinct had just shuffled)
    val trainGrams = train
      .where(col(textCol) =!= "")
      .select(explode(ngramsCol(textCol, n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()
      .withColumn("in_train", lit(1))
    val evalGrams = eval
      .where(col(textCol) =!= "")
      .select(col(idCol), explode(ngramsCol(textCol, n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
      .distinct()
    // ONE left join + ONE aggregation: the train side is distinct, so the
    // left join preserves eval multiplicity (n_ngrams = row count) and a
    // matched marker counts exactly the leaked distinct grams. The old
    // shape aggregated the eval grams twice and joined twice, which also
    // recomputed the eval explode subtree per consumer (r6, guide §2.4).
    evalGrams
      .join(trainGrams, Seq("gh"), "left")
      .groupBy(idCol)
      .agg(count(col("in_train")).as("n_hit"), count(lit(1)).as("n_ngrams"))
      .where(col("n_hit") >= 1)
      .select(col(idCol), col("n_hit"), col("n_ngrams"))
  }
}
