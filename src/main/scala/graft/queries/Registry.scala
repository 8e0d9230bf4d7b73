package graft.queries

import graft.QueryDef

/** Single assembly point for the engine's whole query surface. Each
  * sub-registry owns one domain from SURVEY.md §2 / the extension list.
  */
object Registry {
  def all: Seq[(String, QueryDef)] =
    Relational.all ++ Quality.all ++ Churn.all ++
      TextOps.all ++ Dedup.all ++ Similarity.all ++ Events.all ++
      Multimodal.all ++ ApproxOps.all ++ Advanced.all ++ Temporal.all ++
      TextClean.all ++ Profiling.all ++ DedupClusters.all ++
      Packing.all ++ Provenance.all ++ ProductQuantization.all ++
      IvfPq.all ++ LabelQuality.all ++ LmQuality.all ++ BpeVocab.all ++
      Layout.all ++ Projection.all ++ Attribution.all ++ DupSpans.all ++
      Curation.all ++ Sketches.all ++ Lakehouse.all ++ Retrieval.all ++
      Sequence.all ++ Basket.all ++ Outliers.all ++ FuzzyJoin.all ++
      FeatureEng.all ++ PrivacyOps.all ++ Scoring.all ++ Curriculum.all ++
      VocabOps.all ++ EmbeddingStats.all ++ Scd.all ++ Graph.all ++
      Stats.all ++ TimeSeries.all ++ Winsorize.all ++ Contrastive.all ++
      Audit.all ++ MlEval.all ++ Bootstrap.all ++ Drift.all ++
      Survival.all ++ Rfm.all ++ Cohorts.all ++ Concentration.all ++
      GraphAnn.all
}
