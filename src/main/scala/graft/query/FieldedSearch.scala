package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{AttrPred, AttrSidecar, IndexBuilder}
import graft.query.BlockMaxWand.{BlockRef, FilterIter, PostingIter}

/** Multi-field text search — the reference provisions THREE analyzed text
  * fields side by side (comment/data/dataPresentation,
  * `ElasticSearchStorage.cs:217,227,231`); ES queries them via
  * `multi_match` with per-field boosts. Engine rendition: a field is an
  * index over a column (Lucene likewise keeps per-field postings fully
  * separate — field is part of the term key). All field indexes share the
  * docID space (docIDs derive from the url sort rank, independent of
  * which column was analyzed) and the same slice layout, so one WAND task
  * can merge iterators from every field of its doc range.
  *
  * Scoring = ES `most_fields`: score(d) = Σ_f boost_f · Σ_t
  * idf_f(t)·impact(tf_{f,t,d}, dl_f(d), avgdl_f) — each field has its own
  * df/avgdl/doc_len (exactly what ES computes per field). A doc is a
  * candidate when ANY (field, term) matches (multi_match's default OR).
  * Sum order is fields-outer × terms-inner, mirrored by
  * NaiveBm25.fieldedTopK and the DuckDB oracle.
  *
  * Scale shape: per-field posting scans are pushdown-filtered to the
  * query terms; ONE shuffle co-locates all fields' matched blocks by
  * slice; per-slice WAND over |fields|·|terms| iterators; nSlices·k merge.
  * Building per-field indexes costs one column-pruned pass per field over
  * the columnar source — the parquet scan reads only that field's column.
  */
object FieldedSearch {

  final case class Field(name: String, indexDir: String, boost: Double)

  /** Filter context = ES bool-query filter clause next to the multi_match,
    * evaluated against the FIRST field's doc attributes (all field indexes
    * share the docID space and attributes): `attrFilter` streams the first
    * field's slice sidecar node-locally (no doc-id exchange); `docFilter`
    * (nullable Column) is the ad-hoc allow-list path.
    */
  def topK(
      spark: SparkSession,
      fields: Seq[Field],
      queryTerms: Seq[String],
      k: Int,
      docFilter: Column = null,
      attrFilter: AttrPred = null
  ): DataFrame = {
    import spark.implicits._
    require(fields.nonEmpty)
    require(docFilter == null || attrFilter == null,
      "pass docFilter (ad-hoc Column) or attrFilter (typed sidecar predicate), not both")
    val terms = queryTerms.distinct

    val stats = fields.map(f => IndexBuilder.readStats(spark, f.indexDir))
    val n = stats.head.n_docs
    require(stats.forall(_.n_docs == n),
      "field indexes must share the docID space (same corpus, same urls)")
    val metas = fields.map(f => IndexBuilder.readMeta(f.indexDir))
    require(metas.map(_.nSlices).distinct.size == 1,
      "field indexes must share the slice layout")
    val avgDls = stats.map(s => if (s.avg_dl > 0) s.avg_dl else 1.0).toArray

    // per-field df for the query terms (tiny pushdown reads)
    val dfs: Array[Map[String, Long]] = fields.map { f =>
      IndexBuilder.readTerms(spark, f.indexDir)
        .where($"term".isin(terms: _*))
        .collect().map(t => t.term -> t.doc_freq).toMap
    }.toArray
    if (!dfs.exists(_.nonEmpty))
      return spark.emptyDataset[Search.QueryHit].toDF()

    // weight per (field, term) = boost · idf_field(term); 0-df pairs absent
    val qTerms = terms.toArray
    val boosts = fields.map(_.boost).toArray
    val weights: Array[Array[Double]] = Array.tabulate(fields.size) { fi =>
      qTerms.map(t => boosts(fi) * NaiveBm25.idf(n, dfs(fi).getOrElse(t, 0L)))
    }
    val bCtx = spark.sparkContext.broadcast((qTerms, weights, avgDls))

    val blocks = fields.zipWithIndex
      .map { case (f, fi) =>
        IndexBuilder.readPostings(spark, f.indexDir)
          .where($"term".isin(terms: _*))
          .select(
            lit(fi).as("fld"), $"slice", $"term", $"block_id", $"doc_id_min",
            $"doc_id_max", $"count", $"deltas", $"tfs", $"dls", $"poss", $"max_impact"
          )
      }
      .reduce(_ unionByName _)
      .as[(Int, Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)]

    def wand(rows: Iterator[(Int, Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)],
             filter: DocFilter): Iterator[Search.QueryHit] = {
      val (ts, ws, avgs) = bCtx.value
      val byFieldTerm = rows.toArray.groupBy(r => (r._1, r._3))
      // iterator order: fields outer × terms inner (the scoring contract)
      val iters = (for {
        fi <- avgs.indices.iterator
        ti <- ts.indices.iterator
        rs <- byFieldTerm.get((fi, ts(ti))).iterator
      } yield {
        val refs = rs
          .sortBy(r => (r._5, r._4))
          .map(r => BlockRef(r._5, r._6, r._7, r._8, r._9, r._10, r._11, r._12))
        new PostingIter(fi * ts.length + ti, ws(fi)(ti), refs, avgs(fi))
      }).toArray
      BlockMaxWand.or(iters, k, filter)
        .iterator.map(h => Search.QueryHit(h.docId, h.score))
    }

    val attrDir = fields.head.indexDir
    val localTopK =
      if (docFilter == null && attrFilter == null)
        blocks
          .groupByKey(_._2) // slice — ONE task sees every field of its doc range
          .flatMapGroups { (_, rows) => wand(rows, null) }
      else if (attrFilter != null) {
        val pred = attrFilter
        blocks
          .groupByKey(_._2)
          .flatMapGroups { (slice, rows) =>
            val cur = AttrSidecar.openCursor(attrDir, slice, pred)
            try wand(rows, cur)
            finally cur.close()
          }
      } else {
        val filterIds = spark.read.parquet(s"${fields.head.indexDir}/docs")
          .where(docFilter)
          .select($"slice".cast("int"), $"doc_id")
          .as[(Int, Long)]
        blocks
          .groupByKey(_._2)
          .cogroup(filterIds.groupByKey(_._1)) { (_, rows, fids) =>
            val allow = fids.map(_._2).toArray
            if (allow.isEmpty) Iterator.empty
            else {
              java.util.Arrays.sort(allow)
              wand(rows, new FilterIter(allow))
            }
          }
      }

    localTopK.toDF().orderBy(desc("score"), asc("doc_id")).limit(k)
  }
}
